#!/usr/bin/env python
"""Heads-inner interleave for the NON-causal one-pass fold kernel, plus a
re-measure of the causal heads-inner result (proto_causal_fast3.py r1:
137.5 TF — suspiciously above the heads-outer non-causal 153 in effective
rate, so re-confirm with more windows before believing it).

Interleave hypothesis: with strips OUTER and folded heads INNER, each
strip-class issues `fold` identical-shape matmul pairs back-to-back; head
h's VPU softmax hides under head h+1's same-shape MXU work, instead of
hiding under the NEXT strip's differently-shaped matmul."""
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
    attention_flops, time_fn_chained_windows,
)

LOG2E = math.log2(math.e)


def _fold_hi_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, q_chunk, fold):
    """Non-causal one-pass, fold heads per program, strips outer."""
    block_q = q_ref.shape[1]
    c = scale * LOG2E
    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        for hh in range(fold):
            k = k_ref[hh]
            v = v_ref[hh]
            q = q_ref[hh, q0:q0 + rows, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q, k))
            m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(
                pb, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(v))
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[hh, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)


def fold_hi(qf, kf, vf, scale, q_chunk, fold, out_dtype=jnp.bfloat16):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    kernel = functools.partial(_fold_hi_kernel, scale=scale,
                               q_chunk=q_chunk, fold=fold)
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
fl = attention_flops(B, H, L, L, D)
kf = kd.reshape(B * H, L, D)
vf = vd.reshape(B * H, L, D)

ref = naive_attention(q[:1, :4], k[:1, :4], v[:1, :4])
out = np.asarray(fold_hi(q0[:1, :4].reshape(4, L, D),
                         kd[:1, :4].reshape(4, L, D),
                         vd[:1, :4].reshape(4, L, D), scale, 256, 4,
                         out_dtype=jnp.float32)).reshape(1, 4, L, D)
st = error_stats(out, ref)
print("fold_hi accuracy:", {kk: f"{vv:.2e}" for kk, vv in st.items()
                            if isinstance(vv, float)}, flush=True)
assert st["max_abs"] < 1e-2, st


def run(name, fn, flops):
    secs = time_fn_chained_windows(fn, q0, n_long=16, n_short=4, reps=4,
                                   windows=5)
    tf = sorted(flops / s / 1e12 for s in secs)
    print(f"{name:34s} min {tf[0]:6.1f} med {tf[2]:6.1f} "
          f"max {tf[-1]:6.1f} TF", flush=True)


def mk(qc, fold):
    def f(x):
        return fold_hi(x.reshape(B * H, L, D), kf, vf, scale, qc,
                       fold).reshape(B, H, L, D)
    return f


run("NC heads-inner fold4 c256", mk(256, 4), fl)
run("NC heads-inner fold4 c512", mk(512, 4), fl)
run("NC shipped one-pass (autoblock)", lambda x: flash_attention_v1(
    x, kd, vd, config=TileConfig(block_q=1024, block_kv=1024,
                                 head_fold=4)), fl)

# causal heads-inner re-measure (same kernel as proto_causal_fast3 r1,
# loaded without executing that script's module-level benchmark)
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "pc3", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "proto_causal_fast3.py"))
_pc3_src = open(_spec.origin).read()
_pc3_src = _pc3_src[:_pc3_src.index('B, H, L, D = ')]
_ns = {"__file__": _spec.origin}
exec(compile(_pc3_src, _spec.origin, "exec"), _ns)
band_causal = _ns["band_causal"]

flc = attention_flops(B, H, L, L, D, causal=True)
run("C  heads-inner fold4 c256 (r1)", lambda x: band_causal(
    x.reshape(B * H, L, D), kf, vf, scale, 256, 4, True,
    ).reshape(B, H, L, D), flc)
