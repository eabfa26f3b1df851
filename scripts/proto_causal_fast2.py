#!/usr/bin/env python
"""Causal one-pass round 2: band split x head-fold, plus a mask-deleted
bound with identical strip spans (pins the residual VPU mask cost).

proto_causal_fast.py measured: shipped 90.2 TF, band chunk=256 97.9,
chunk=128 81.4 (strip overhead dominates), chunk=512 89.7.  The causal
program does half the work of the headline program per (b, h), so the
per-program pipeline fill the head-fold amortizes is a LARGER fraction
here — fold should pay more than the headline's +3-5%.
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
from exploring_flash_attention_tpu.ops.attention_v1 import dot_precision
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

LOG2E = math.log2(math.e)
LANES = 128


def _band_fold_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, q_chunk,
                      q_base, diag_off, fold, use_mask=True):
    block_q = q_ref.shape[1]
    vis_blk = k_ref.shape[1]
    c = scale * LOG2E
    for hh in range(fold):
        k = k_ref[hh]
        v = v_ref[hh]
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            span_exact = q_base + q0 + rows + diag_off
            span = min(vis_blk, -(-max(span_exact, 1) // LANES) * LANES)
            q = q_ref[hh, q0:q0 + rows, :]
            ks = k[:span]
            vs = v[:span]
            s = jax.lax.dot_general(
                q, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q, ks))
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
                denom = jnp.sum(pd.astype(jnp.float32), axis=1,
                                keepdims=True)
            band = span - band_lo
            if band > 0:
                sb = s[:, band_lo:]
                pbf = jnp.exp2(sb * c - m)
                if use_mask:
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, band), 1)
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, band), 0)
                    keep = col + band_lo <= row + (q_base + q0 + diag_off)
                    pbf = jnp.where(keep, pbf, 0.0)
                pb = pbf.astype(v.dtype)
                pv_b = jax.lax.dot_general(
                    pb, vs[band_lo:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(vs))
                den_b = jnp.sum(pb.astype(jnp.float32), axis=1,
                                keepdims=True)
                pv = pv_b if pv is None else pv + pv_b
                denom = den_b if denom is None else denom + den_b
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[hh, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)


def band_causal_fold(qf, kf, vf, scale, q_chunk, fold,
                     out_dtype=jnp.bfloat16, use_mask=True):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    diag_off = lkv - lq
    assert n_bh % fold == 0
    kernel = functools.partial(
        _band_fold_kernel, scale=scale, q_chunk=q_chunk,
        q_base=0, diag_off=diag_off, fold=fold, use_mask=use_mask)
    return pl.pallas_call(
        kernel,
        grid=(n_bh // fold, 1),
        in_specs=[
            pl.BlockSpec((fold, lq, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((fold, lkv, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((fold, lkv, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((fold, lq, d), lambda bh, qi: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qf, kf, vf)


B, H, L, D = 32, 8, 1024, 128
q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
scale = 1.0 / math.sqrt(D)
flops = attention_flops(B, H, L, L, D, causal=True)
kf = kd.reshape(B * H, L, D)
vf = vd.reshape(B * H, L, D)

# accuracy: fold=4 band variant vs oracle on a slice
ref = naive_attention(q[:1, :4], k[:1, :4], v[:1, :4], causal=True)
out_h = np.asarray(band_causal_fold(
    q0[:1, :4].reshape(4, L, D), kd[:1, :4].reshape(4, L, D),
    vd[:1, :4].reshape(4, L, D), scale, 256, 4,
    out_dtype=jnp.float32)).reshape(1, 4, L, D)
st = error_stats(out_h, ref)
print("band_fold accuracy:", {kk: f"{vv:.2e}" for kk, vv in st.items()
                              if isinstance(vv, float)}, flush=True)
assert st["max_abs"] < 1e-2, st


def run(name, fn):
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=5)
    print(f"{name:38s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TF",
          flush=True)


def mk(qc, fold, use_mask=True):
    def f(x):
        o = band_causal_fold(x.reshape(B * H, L, D), kf, vf, scale, qc,
                             fold, use_mask=use_mask)
        return o.reshape(B, H, L, D)
    return f


run("h  band c256 fold4", mk(256, 4))
run("h2 band c256 fold2", mk(256, 2))
run("h3 band c128 fold4", mk(128, 4))
run("n  NOMASK bound c256 fold4", mk(256, 4, use_mask=False))
run("n2 NOMASK bound c256 fold1", mk(256, 1, use_mask=False))
