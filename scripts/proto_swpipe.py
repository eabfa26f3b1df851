"""Proto: software-pipelined one-pass kernel — issue strip t+1's QK matmul
ahead of strip t's VPU softmax in program order, vs the current form that
relies on Mosaic reordering across the unrolled strip bodies."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_v1 import (
    LOG2E, dot_precision,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
Q_CHUNK = 256


def kernel_swpipe(q_ref, k_ref, v_ref, o_ref, *, scale):
    block_q = q_ref.shape[1]
    c = scale * LOG2E
    k = k_ref[0]
    v = v_ref[0]
    n = block_q // Q_CHUNK

    def qk(t):
        q = q_ref[0, t * Q_CHUNK:(t + 1) * Q_CHUNK, :]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )

    s_next = qk(0)
    for t in range(n):
        s = s_next
        if t + 1 < n:
            s_next = qk(t + 1)          # issued before this strip's VPU work
        m = jnp.max(s, axis=1, keepdims=True) * c
        p = jnp.exp2(s * c - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(v),
        )
        o_ref[0, t * Q_CHUNK:(t + 1) * Q_CHUNK, :] = (
            pv / denom
        ).astype(o_ref.dtype)


@jax.jit
def attn_swpipe(qf, kf, vf):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    block_q = 1024
    return pl.pallas_call(
        functools.partial(kernel_swpipe, scale=1.0 / np.sqrt(d)),
        grid=(n_bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, kf, vf)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    fl = attention_flops(B, H, L, L, D)

    sec = time_fn_chained(lambda x: flash_attention_v1(x, kb, vb), qb)
    print(f"standard one-pass   {sec*1e3:8.3f} ms  {fl/sec/1e12:7.1f} TF",
          flush=True)

    qf = qb.reshape(B * H, L, D)
    kf = kb.reshape(B * H, L, D)
    vf = vb.reshape(B * H, L, D)
    ref = np.asarray(flash_attention_v1(qb, kb, vb)).reshape(B * H, L, D)
    got = np.asarray(attn_swpipe(qf, kf, vf))
    err = np.abs(got.astype(np.float32) - ref.astype(np.float32)).max()
    print(f"swpipe max|diff| vs standard: {err:.2e}", flush=True)

    sec = time_fn_chained(lambda x: attn_swpipe(x, kf, vf), qf)
    print(f"sw-pipelined        {sec*1e3:8.3f} ms  {fl/sec/1e12:7.1f} TF",
          flush=True)


if __name__ == "__main__":
    main()
