#!/usr/bin/env python
"""Prototype round 3: accuracy-preserving scale folding.

C) q unscaled; p = exp2(s*c - m*c), c = scale*log2e — one FMA pass on s,
   no bf16 re-rounding of q.
D) exact power-of-2 prescale of q (exponent-only, lossless in bf16) +
   residual folded in the FMA — same op count as C, smaller |s*c| range.
"""
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)


def _kernel_c(q_ref, k_ref, v_ref, o_ref, *, c, q_chunk):
    bq = q_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, q_chunk):
        q = q_ref[0, q0:q0 + q_chunk, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True) * c
        p = jnp.exp2(s * c - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, q0:q0 + q_chunk, :] = (pv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "q_chunk", "pow2"))
def onepass3(q, k, v, block_q=1024, q_chunk=256, pow2=False):
    b, h, l, d = q.shape
    c = LOG2E / math.sqrt(d)
    n_bh = b * h
    qf = q.reshape(n_bh, l, d)
    if pow2:
        # exponent-only scale: exact in bf16
        e = math.floor(math.log2(c))
        qf = qf * jnp.asarray(2.0 ** e, q.dtype)
        c = c / (2.0 ** e)
    kf = k.reshape(n_bh, l, d)
    vf = v.reshape(n_bh, l, d)
    out = pl.pallas_call(
        functools.partial(_kernel_c, c=c, q_chunk=q_chunk),
        grid=(n_bh, l // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, l, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, l, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, l, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, l, d)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    flops = attention_flops(B, H, L, L, D)
    roof = roofline_attention_tflops(B, H, L, D)
    ref = naive_attention(
        *(np.asarray(x[:2, :2].astype(jnp.float32)) for x in (q0, kd, vd)))

    for name, kwargs in [("C qc=256", dict(q_chunk=256)),
                         ("D qc=256 pow2", dict(q_chunk=256, pow2=True)),
                         ("C qc=256 bq=512", dict(q_chunk=256, block_q=512))]:
        out = np.asarray(onepass3(
            q0[:2, :2], kd[:2, :2], vd[:2, :2], **kwargs).astype(jnp.float32))
        err = error_stats(out, ref)["max_abs"]
        def step(x, kwargs=kwargs):
            return onepass3(x, kd, vd, **kwargs)
        sec = time_fn_chained(step, q0, n_long=16, n_short=4, reps=3)
        tf = flops / sec / 1e12
        print(f"{name:18s} {sec*1e3:7.3f} ms {tf:7.1f} TF {100*tf/roof:5.1f}% "
              f"max_abs={err:.2e}")


if __name__ == "__main__":
    main()
