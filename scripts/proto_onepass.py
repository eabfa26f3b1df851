#!/usr/bin/env python
"""Prototype: one-pass softmax kernel for KV-resident-in-VMEM shapes,
with internal q/kv chunking knobs to expose MXU/VPU overlap to the Mosaic
scheduler.  Measured against the current best (v1 full-block)."""
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

from exploring_flash_attention_tpu.oracle.reference import make_qkv, error_stats, naive_attention
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, q_chunk, kv_chunk):
    # blocks: (1, BQ, d), (1, L, d), (1, L, d) -> (1, BQ, d)
    bq = q_ref.shape[1]
    l = k_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, q_chunk):
        q = q_ref[0, q0:q0 + q_chunk, :]
        # scores over full L, chunked along kv for scheduler freedom
        parts = []
        for k0 in range(0, l, kv_chunk):
            s = jax.lax.dot_general(
                q, k[k0:k0 + kv_chunk, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            parts.append(s * scale)
        s = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, q0:q0 + q_chunk, :] = (pv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "q_chunk", "kv_chunk"))
def onepass(q, k, v, block_q=512, q_chunk=256, kv_chunk=1024):
    b, h, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    n_bh = b * h
    qf = q.reshape(n_bh, l, d)
    kf = k.reshape(n_bh, l, d)
    vf = v.reshape(n_bh, l, d)
    out = pl.pallas_call(
        functools.partial(_onepass_kernel, scale=scale,
                          q_chunk=q_chunk, kv_chunk=kv_chunk),
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

    # accuracy spot-check
    out = np.asarray(onepass(q0[:2, :2], kd[:2, :2], vd[:2, :2]).astype(jnp.float32))
    ref = naive_attention(*(np.asarray(x[:2, :2].astype(jnp.float32)) for x in (q0, kd, vd)))
    print("max_abs:", error_stats(out, ref)["max_abs"])

    for bq, qc, kc in [(512, 512, 1024), (512, 256, 1024), (512, 128, 1024),
                       (1024, 256, 1024), (1024, 512, 1024),
                       (512, 256, 512), (256, 256, 1024), (512, 512, 512)]:
        def step(x, bq=bq, qc=qc, kc=kc):
            return onepass(x, kd, vd, block_q=bq, q_chunk=qc, kv_chunk=kc)
        try:
            sec = time_fn_chained(step, q0, n_long=16, n_short=4, reps=3)
        except Exception as e:
            print(f"bq={bq} qc={qc} kc={kc}  FAILED {str(e)[:90]}")
            continue
        tf = flops / sec / 1e12
        print(f"bq={bq:5d} qc={qc:4d} kc={kc:5d} {sec*1e3:7.3f} ms  {tf:7.1f} TF  {100*tf/roof:5.1f}%")


if __name__ == "__main__":
    main()
