"""Proto: one-pass kernel with pre-transposed K [d, Lkv] vs standard.

If A@B^T forces a Mosaic relayout of K per strip, feeding K^T (natural
(K, N) layout for the MXU) should show it.  K^T can come for free from
the projection einsum in a real model, so only kernel time matters.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_v1 import (
    LOG2E, dot_precision,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128


def kernel_kT(q_ref, kt_ref, v_ref, o_ref, *, scale, q_chunk):
    block_q = q_ref.shape[1]
    c = scale * LOG2E
    kt = kt_ref[0]                       # (d, Lkv)
    v = v_ref[0]
    for q0 in range(0, block_q, q_chunk):
        q = q_ref[0, q0:q0 + q_chunk, :]
        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, kt),
        )
        m = jnp.max(s, axis=1, keepdims=True) * c
        p = jnp.exp2(s * c - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(v),
        )
        o_ref[0, q0:q0 + q_chunk, :] = (pv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def attn_kT(qf, ktf, vf):
    n_bh, lq, d = qf.shape
    lkv = vf.shape[1]
    block_q = 1024
    return pl.pallas_call(
        functools.partial(kernel_kT, scale=1.0 / np.sqrt(d), q_chunk=256),
        grid=(n_bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, d, lkv), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, ktf, vf)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    fl = attention_flops(B, H, L, L, D)

    sec = time_fn_chained(
        lambda x: flash_attention_v1(x, kb, vb), qb)
    print(f"standard one-pass        {sec*1e3:8.3f} ms  "
          f"{fl/sec/1e12:7.1f} TF", flush=True)

    qf = qb.reshape(B * H, L, D)
    ktf = kb.reshape(B * H, L, D).transpose(0, 2, 1)
    vf = vb.reshape(B * H, L, D)
    # correctness
    ref = np.asarray(flash_attention_v1(qb, kb, vb)).reshape(B * H, L, D)
    got = np.asarray(attn_kT(qf, ktf, vf))
    err = np.abs(got.astype(np.float32) - ref.astype(np.float32)).max()
    print(f"kT variant max|diff| vs standard: {err:.2e}", flush=True)

    sec = time_fn_chained(lambda x: attn_kT(x, ktf, vf), qf)
    print(f"pre-transposed-K one-pass {sec*1e3:8.3f} ms  "
          f"{fl/sec/1e12:7.1f} TF", flush=True)


if __name__ == "__main__":
    main()
