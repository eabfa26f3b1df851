#!/usr/bin/env python
"""Causal one-pass variants: dense-prefix + diagonal-band strip decomposition.

Hypothesis (VERDICT r2 item 2): the shipped causal kernel runs its
mask (2 iotas + cmp + select) over the FULL (rows, span) strip, roughly
doubling the VPU work per score element vs the non-causal kernel, so the
VPU stops riding under the MXU.  Only the trailing `rows`-wide diagonal
band actually needs masking; the dense prefix is fully visible.  Taking
the row max over the FULL strip (an upper bound on the visible max) is
mathematically free — softmax is shift-invariant for any shift >= max —
and removes the need to mask before the max.

Variants:
  a  shipped causal kernel (whole-strip mask), chunk=256
  b  dense+band split, chunk=256
  c  dense+band split, chunk=128
  d  dense+band split, chunk=512
  e  non-causal one-pass for scale (full flops)
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
from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_v1 import dot_precision
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

LOG2E = math.log2(math.e)
LANES = 128


def _band_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, q_chunk, q_base,
                 diag_off):
    block_q = q_ref.shape[1]
    vis_blk = k_ref.shape[1]
    c = scale * LOG2E
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        span_exact = q_base + q0 + rows + diag_off
        span = min(vis_blk, -(-max(span_exact, 1) // LANES) * LANES)
        if span <= 0:
            o_ref[0, q0:q0 + rows, :] = jnp.zeros(
                (rows, o_ref.shape[2]), o_ref.dtype)
            continue
        q = q_ref[0, q0:q0 + rows, :]
        ks = k[:span]
        vs = v[:span]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, ks))
        # full-strip max: upper bound of the visible max, shift-invariant
        m = jnp.max(s, axis=1, keepdims=True) * c
        band_lo = min(span, max(0, (q_base + q0 + diag_off + 1)
                                // LANES * LANES))
        pv = None
        denom = None
        if band_lo > 0:
            pd = jnp.exp2(s[:, :band_lo] * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(
                pd, vs[:band_lo], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(vs))
            denom = jnp.sum(pd.astype(jnp.float32), axis=1, keepdims=True)
        band = span - band_lo
        if band > 0:
            sb = s[:, band_lo:]
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, band), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, band), 0)
            keep = col + band_lo <= row + (q_base + q0 + diag_off)
            pb = jnp.where(keep, jnp.exp2(sb * c - m), 0.0).astype(v.dtype)
            pv_b = jax.lax.dot_general(
                pb, vs[band_lo:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(vs))
            den_b = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            pv = pv_b if pv is None else pv + pv_b
            denom = den_b if denom is None else denom + den_b
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)


def band_causal(qf, kf, vf, scale, q_chunk, out_dtype=jnp.bfloat16):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    diag_off = lkv - lq
    block_q = min(1024, lq)
    outs = []
    for q_base in range(0, lq, block_q):
        bq = min(block_q, lq - q_base)
        vis = diag_off + q_base + bq
        vis = -(-max(vis, 1) // LANES) * LANES
        vis = max(8, min(lkv, vis))
        kernel = functools.partial(
            _band_kernel, scale=scale, q_chunk=min(q_chunk, bq),
            q_base=q_base, diag_off=diag_off)
        out_i = pl.pallas_call(
            kernel,
            grid=(n_bh, 1),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, vis, d), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, vis, d), lambda bh, qi: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bh, bq, d), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=False,
        )(qf[:, q_base:q_base + bq], kf[:, :vis], vf[:, :vis])
        outs.append(out_i)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


B, H, L, D = 32, 8, 1024, 128
q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
scale = 1.0 / math.sqrt(D)
flops = attention_flops(B, H, L, L, D, causal=True)

kf = kd.reshape(B * H, L, D)
vf = vd.reshape(B * H, L, D)


def flat(fn):
    return lambda x: fn(x.reshape(B * H, L, D)).reshape(B, H, L, D)


# accuracy check of variant b vs oracle (slice)
ref = naive_attention(q[:2, :2], k[:2, :2], v[:2, :2], causal=True)
out_b = np.asarray(
    band_causal(q0[:2, :2].reshape(4, L, D), kd[:2, :2].reshape(4, L, D),
                vd[:2, :2].reshape(4, L, D), scale, 256,
                out_dtype=jnp.float32)).reshape(2, 2, L, D)
st = error_stats(out_b, ref)
print("band_causal accuracy:", {kk: f"{vv:.2e}" for kk, vv in st.items()
                                if isinstance(vv, float)})
assert st["max_abs"] < 1e-2, st


def run(name, fn, fl=flops):
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=5)
    print(f"{name:36s} {sec*1e3:7.3f} ms  {fl/sec/1e12:6.1f} TF")


run("a shipped causal one-pass", lambda x: flash_attention_v1(
    x, kd, vd, causal=True, config=TileConfig(block_q=1024, block_kv=1024)))
for name, qc in (("b band chunk=256", 256), ("c band chunk=128", 128),
                 ("d band chunk=512", 512)):
    run(name, functools.partial(
        lambda x, qc: flat(lambda xf: band_causal(kf=kf, vf=vf, qf=xf,
                                                  scale=scale, q_chunk=qc))(x),
        qc=qc))
run("e non-causal one-pass (full flops)", lambda x: flash_attention_v1(
    x, kd, vd, config=TileConfig(block_q=1024, block_kv=1024)),
    fl=attention_flops(B, H, L, L, D))
