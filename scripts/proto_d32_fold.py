#!/usr/bin/env python
"""d=32 transposed-PV kernel x head fold x heads-inner interleave.

VERDICT r2 item 7: the pvt kernel reads 40.0 TF/s vs its own measured 49
pinned-rate ceiling.  At d=32 a program does 1/4 of a d=128 program's
MXU work, so per-program pipeline fill weighs 4x more — the exact gap the
head fold amortizes; and the sublane-axis softmax reductions (axis 0 in
the transposed layout) are VPU-heavy, which the strips-outer/heads-inner
interleave hides under the next head's same-shape matmul (the causal
kernel measured +38% from that reorder alone, proto_causal_fast3.py)."""
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

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention,
)
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_v1 import dot_precision
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

LOG2E = math.log2(math.e)


def _pvt_fold_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, q_chunk, fold,
                     heads_inner):
    block_q = q_ref.shape[1]
    c = scale * LOG2E

    def strip(hh, q0, rows):
        qc = q_ref[hh, q0:q0 + rows, :]
        st = jax.lax.dot_general(
            k_ref[hh], qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(k_ref[hh], qc))     # [Lkv, rows] = S^T
        m = jnp.max(st, axis=0, keepdims=True) * c
        pb = jnp.exp2(st * c - m).astype(v_ref.dtype)
        ot = jax.lax.dot_general(
            v_ref[hh], pb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref[hh]))         # [d, rows] = O^T
        denom = jnp.sum(pb.astype(jnp.float32), axis=0, keepdims=True)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[hh, :, q0:q0 + rows] = (ot / denom).astype(o_ref.dtype)

    if heads_inner:
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            for hh in range(fold):
                strip(hh, q0, rows)
    else:
        for hh in range(fold):
            for q0 in range(0, block_q, q_chunk):
                strip(hh, q0, min(q_chunk, block_q - q0))


def pvt_fold(qf, kf, vf, scale, q_chunk, fold, heads_inner,
             out_dtype=jnp.bfloat16):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    kernel = functools.partial(_pvt_fold_kernel, scale=scale,
                               q_chunk=q_chunk, fold=fold,
                               heads_inner=heads_inner)
    ot = pl.pallas_call(
        kernel,
        grid=(n_bh // fold, 1),
        in_specs=[
            pl.BlockSpec((fold, lq, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((fold, lkv, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((fold, lkv, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((fold, d, lq), lambda bh, qi: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, d, lq), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qf, kf, vf)
    return jnp.swapaxes(ot, 1, 2)


B, H, L, D = 32, 8, 1024, 32
q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
scale = 1.0 / math.sqrt(D)
fl = attention_flops(B, H, L, L, D)
kf = kd.reshape(B * H, L, D)
vf = vd.reshape(B * H, L, D)

ref = naive_attention(q[:1, :4], k[:1, :4], v[:1, :4])
out = np.asarray(pvt_fold(q0[:1, :4].reshape(4, L, D),
                          kd[:1, :4].reshape(4, L, D),
                          vd[:1, :4].reshape(4, L, D), scale, 256, 4, True,
                          out_dtype=jnp.float32)).reshape(1, 4, L, D)
st = error_stats(out, ref)
print("pvt_fold accuracy:", {kk: f"{vv:.2e}" for kk, vv in st.items()
                             if isinstance(vv, float)}, flush=True)
assert st["max_abs"] < 1e-2, st


def run(name, fn):
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=4)
    print(f"{name:34s} {sec*1e3:7.3f} ms  {fl/sec/1e12:6.1f} TF", flush=True)


def mk(qc, fold, hi):
    def f(x):
        return pvt_fold(x.reshape(B * H, L, D), kf, vf, scale, qc, fold,
                        hi).reshape(B, H, L, D)
    return f


run("shipped pvt (d=32)", lambda x: flash_attention_v1(
    x, kd, vd, config=TileConfig(block_q=1024, block_kv=1024)))
run("pvt fold4 heads-inner c256", mk(256, 4, True))
run("pvt fold8 heads-inner c256", mk(256, 8, True))
run("pvt fold8 heads-outer c256", mk(256, 8, False))
run("pvt fold8 heads-inner c512", mk(512, 8, True))
