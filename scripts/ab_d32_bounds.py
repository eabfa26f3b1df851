#!/usr/bin/env python
"""A/B: raw MXU bounds for the d=32 attention matmul shapes (VERDICT r1
item 3 evidence).

At d=32 both attention matmuls leave 3/4 of the MXU dark:
  QK^T  [L,32]@[32,L]  -- contraction depth 32 of 128
  P@V   [L,L]@[L,32]   -- output lanes 32 of 128
Packing schemes (block-diagonal head stacking, chunked V stacking) trade
those zeros for utilization exactly 1:1 (4x MACs at 4x rate), so the only
open questions are *measured*: what does the hardware actually deliver on
each raw shape, does the transposed PV (full lanes, M=32) beat the direct
PV, and how far below the raw-matmul composite bound does the full kernel
sit?  This script times each candidate with the same chained-scan
estimator the suite uses.

Useful-FLOP accounting: TFLOP/s figures count only the 2*M*K*N of the
exact shape, never the padded/packed MACs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained

L, D = 1024, 32
BH = 32 * 8  # canonical B=32, H=8


def tf(flops, sec):
    return flops / sec / 1e12


def run(name, fn, x0, *extra, flops):
    sec = time_fn_chained(fn, x0, *extra, n_long=16, n_short=4, reps=4)
    print(f"{name:44s} {sec*1e3:8.3f} ms  {tf(flops, sec):7.1f} TFLOP/s")
    return tf(flops, sec)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((BH, L, L)), jnp.bfloat16)

    qk_flops = 2 * BH * L * L * D
    pv_flops = 2 * BH * L * L * D

    # 1. QK^T exact shape (contraction 32)
    def qk(x, kk):
        out = jax.lax.dot_general(
            x, kk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)[..., :D] + x  # carry shape [BH,L,D]

    run("QK^T   [L,32]@[32,L] batched", qk, q, k, flops=qk_flops)

    # 2. QK^T with d padded to 128 (4x MACs, full depth) — conservation check
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 96)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 96)))

    def qk_pad(x, kk):
        out = jax.lax.dot_general(
            x, kk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)[..., :128] + x

    run("QK^T   d padded to 128 (4x MACs)", qk_pad, qp, kp, flops=qk_flops)

    # 3. P@V exact shape (lanes 32)
    def pv(x, vv):
        out = jax.lax.dot_general(
            x, vv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [BH, L, 32]
        return (x + jnp.pad(out.astype(jnp.bfloat16),
                            ((0, 0), (0, 0), (0, L - D))))

    run("P@V    [L,L]@[L,32]", pv, s, v, flops=pv_flops)

    # 4. P@V transposed: O^T = V^T @ P^T (full lanes/contraction, M=32)
    vt = jnp.swapaxes(v, 1, 2)  # [BH, 32, L]

    def pvt(x, vv):
        out = jax.lax.dot_general(
            vv, x, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [BH, 32, L]
        return x + jnp.pad(out.astype(jnp.bfloat16),
                           ((0, 0), (0, L - D), (0, 0)))

    run("V^T@P^T [32,L]@[L,L] (transposed PV)", pvt, s, vt, flops=pv_flops)

    # 5. P@V with V padded to 128 lanes (4x MACs)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 96)))

    def pv_pad(x, vv):
        out = jax.lax.dot_general(
            x, vv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return (x + jnp.pad(out.astype(jnp.bfloat16),
                            ((0, 0), (0, 0), (0, L - 128))))

    run("P@V    V padded to 128 (4x MACs)", pv_pad, s, vp, flops=pv_flops)

    # 6. composite bound check: XLA's own attention at d=32
    def xla_attn(x, kk, vv):
        qt = jnp.swapaxes(x, 1, 2)[None]  # [1, L, BH, 32] B,L,H,d ? needs 4D
        return x

    from exploring_flash_attention_tpu.utils.benchmark import attention_flops
    attn_fl = attention_flops(32, 8, L, L, D)

    def xla_dpa(x, kk, vv):
        q4 = x.reshape(32, 8, L, D).transpose(0, 2, 1, 3)
        k4 = kk.reshape(32, 8, L, D).transpose(0, 2, 1, 3)
        v4 = vv.reshape(32, 8, L, D).transpose(0, 2, 1, 3)
        o = jax.nn.dot_product_attention(q4, k4, v4)
        return o.transpose(0, 2, 1, 3).reshape(BH, L, D)

    run("jax.nn.dot_product_attention d=32", xla_dpa, q, k, v, flops=attn_fl)

    # 7. our kernel, for the same-session comparison row
    from exploring_flash_attention_tpu.ops import flash_attention_v1

    def ours(x, kk, vv):
        return flash_attention_v1(
            x.reshape(32, 8, L, D), kk.reshape(32, 8, L, D),
            vv.reshape(32, 8, L, D)).reshape(BH, L, D)

    run("flash_attention_v1 d=32 (current)", ours, q, k, v, flops=attn_fl)


if __name__ == "__main__":
    main()
