#!/usr/bin/env python
"""Prototype round 2: one-pass kernel micro-optimizations.

A) q pre-scaled by scale*log2(e) outside the kernel + exp2 -> removes the
   full-[q,L] elementwise scale multiply.
B) part-wise max/exp/sum structure for scheduler overlap.
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


def _kernel_a(q_ref, k_ref, v_ref, o_ref, *, q_chunk, kv_chunk):
    # q pre-scaled by scale*log2e; exp2 softmax
    bq = q_ref.shape[1]
    l = k_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, q_chunk):
        q = q_ref[0, q0:q0 + q_chunk, :]
        parts = [
            jax.lax.dot_general(
                q, k[k0:k0 + kv_chunk, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for k0 in range(0, l, kv_chunk)
        ]
        s = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, q0:q0 + q_chunk, :] = (pv / denom).astype(o_ref.dtype)


def _kernel_b(q_ref, k_ref, v_ref, o_ref, *, q_chunk, kv_chunk):
    # part-wise max -> exp2 -> cast pipeline (finer scheduling grain)
    bq = q_ref.shape[1]
    l = k_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, q_chunk):
        q = q_ref[0, q0:q0 + q_chunk, :]
        parts, maxes = [], []
        for k0 in range(0, l, kv_chunk):
            s = jax.lax.dot_general(
                q, k[k0:k0 + kv_chunk, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            parts.append(s)
            maxes.append(jnp.max(s, axis=1, keepdims=True))
        m = functools.reduce(jnp.maximum, maxes)
        pieces, sums = [], []
        for s in parts:
            p = jnp.exp2(s - m)
            sums.append(jnp.sum(p, axis=1, keepdims=True))
            pieces.append(p.astype(v.dtype))
        denom = functools.reduce(jnp.add, sums)
        pvs = [
            jax.lax.dot_general(
                pieces[i], v[i * kv_chunk:(i + 1) * kv_chunk, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            for i in range(len(pieces))
        ]
        pv = functools.reduce(jnp.add, pvs)
        o_ref[0, q0:q0 + q_chunk, :] = (pv / denom).astype(o_ref.dtype)


KERNELS = {"A": _kernel_a, "B": _kernel_b}


@functools.partial(
    jax.jit, static_argnames=("variant", "block_q", "q_chunk", "kv_chunk"))
def onepass2(q, k, v, variant="A", block_q=1024, q_chunk=256, kv_chunk=1024):
    b, h, l, d = q.shape
    scale = LOG2E / math.sqrt(d)
    n_bh = b * h
    qf = (q.reshape(n_bh, l, d).astype(jnp.float32) * scale).astype(q.dtype)
    kf = k.reshape(n_bh, l, d)
    vf = v.reshape(n_bh, l, d)
    out = pl.pallas_call(
        functools.partial(KERNELS[variant], q_chunk=q_chunk, kv_chunk=kv_chunk),
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

    cfgs = [("A", 1024, 256, 1024), ("A", 1024, 512, 1024),
            ("B", 1024, 256, 512), ("B", 1024, 256, 256),
            ("B", 1024, 512, 512), ("B", 512, 256, 512)]
    for var, bq, qc, kc in cfgs:
        out = np.asarray(onepass2(
            q0[:2, :2], kd[:2, :2], vd[:2, :2],
            variant=var, block_q=bq, q_chunk=qc, kv_chunk=kc
        ).astype(jnp.float32))
        err = error_stats(out, ref)["max_abs"]
        def step(x, var=var, bq=bq, qc=qc, kc=kc):
            return onepass2(x, kd, vd, variant=var, block_q=bq,
                            q_chunk=qc, kv_chunk=kc)
        sec = time_fn_chained(step, q0, n_long=16, n_short=4, reps=3)
        tf = flops / sec / 1e12
        print(f"{var} bq={bq:5d} qc={qc:4d} kc={kc:5d} {sec*1e3:7.3f} ms "
              f"{tf:7.1f} TF {100*tf/roof:5.1f}%  max_abs={err:.2e}")


if __name__ == "__main__":
    main()
