#!/usr/bin/env python
"""Prototype round 4: cast-free exp2 (bf16 argument) + gate-shape accuracy.

E) p = exp2(bf16(s*c - m)) — the cast rides the FMA output, PV consumes
   bf16 p directly; no separate 256K-element cast pass.
Accuracy for A (prescaled q), C (FMA scale), E measured at BOTH the bench
gate shape (2,4,512) and the canonical (subset) shape.
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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, c, q_chunk, variant):
    bq = q_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, q_chunk):
        q = q_ref[0, q0:q0 + q_chunk, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "A":          # q was prescaled by c outside
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m).astype(v.dtype)
        elif variant == "C":        # FMA scale fold, f32 exp2, cast
            m = jnp.max(s, axis=1, keepdims=True) * c
            p = jnp.exp2(s * c - m).astype(v.dtype)
        elif variant == "E":        # FMA scale fold, bf16-arg exp2
            m = jnp.max(s, axis=1, keepdims=True) * c
            p = jnp.exp2((s * c - m).astype(v.dtype))
        denom = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, q0:q0 + q_chunk, :] = (pv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "q_chunk", "variant"))
def onepass4(q, k, v, block_q=1024, q_chunk=256, variant="C"):
    b, h, l, d = q.shape
    c = LOG2E / math.sqrt(d)
    n_bh = b * h
    block_q = min(block_q, l)
    qf = q.reshape(n_bh, l, d)
    if variant == "A":
        qf = (qf.astype(jnp.float32) * c).astype(q.dtype)
    kf = k.reshape(n_bh, l, d)
    vf = v.reshape(n_bh, l, d)
    out = pl.pallas_call(
        functools.partial(_kernel, c=c, q_chunk=min(q_chunk, block_q),
                          variant=variant),
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


def acc(variant, b, h, l):
    q, k, v = make_qkv(b, h, l, D, dtype=np.float32, seed=0)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    out = np.asarray(onepass4(qb, kb, vb, variant=variant).astype(jnp.float32))
    ref = naive_attention(*(np.asarray(x.astype(jnp.float32)) for x in (qb, kb, vb)))
    return error_stats(out, ref)["max_abs"]


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    flops = attention_flops(B, H, L, L, D)
    roof = roofline_attention_tflops(B, H, L, D)

    for variant in ("A", "C", "E"):
        e_gate = acc(variant, 2, 4, 512)
        e_big = acc(variant, 2, 2, 1024)
        def step(x, variant=variant):
            return onepass4(x, kd, vd, variant=variant)
        sec = time_fn_chained(step, q0, n_long=16, n_short=4, reps=3)
        tf = flops / sec / 1e12
        print(f"{variant} {sec*1e3:7.3f} ms {tf:7.1f} TF {100*tf/roof:5.1f}% "
              f"gate(2,4,512)={e_gate:.2e} big(2,2,1024)={e_big:.2e}")


if __name__ == "__main__":
    main()
