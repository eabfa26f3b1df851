#!/usr/bin/env python
"""VERDICT r4 item 6: ship-or-bury the d=32 ones-row denominator trick.

In the transposed-PV d=32 kernel (ops/attention_v1.py:_v1_onepass_kernel_pvt)
the denominator is a sublane reduce over Lkv.  Appending a ones row to the
V^T operand (output M 32 -> 40 sublanes) folds that reduce into the same
MXU pass.  A/B at B=32,H=8,L=1024,d=32 against the shipped exact (41.4)
and bound (55.1) rows.
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.oracle.reference import (
    make_qkv, naive_attention,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained_windows,
)

B, H, L, D = 32, 8, 1024, 32
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
N_LONG = 96
WINDOWS = 6
BOUND_SHIFT = 64.0


def kernel(q_ref, k_ref, v_ref, o_ref, *, c, mode, ones):
    k = k_ref[0]
    v = v_ref[0]                  # [Lkv, D] or [Lkv, D+8] with ones cols
    kms = None
    if "bound" in mode:
        kf32 = k.astype(jnp.float32)
        kms = jnp.max(jnp.sum(kf32 * kf32, axis=1))
    qc_all = q_ref.shape[1]
    qc = q_ref[0]
    st = jax.lax.dot_general(k, qc, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if "bound" in mode:
        qf32 = qc.astype(jnp.float32)
        q_sq = jnp.sum(qf32 * qf32, axis=1)
        m = (jnp.sqrt(q_sq * kms) * c - BOUND_SHIFT)[None, :]
    else:
        m = jnp.max(st, axis=0, keepdims=True) * c
    pb = jnp.exp2(st * c - m).astype(v.dtype)
    ot = jax.lax.dot_general(v, pb, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if ones:
        denom = ot[D:D + 1, :]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (ot[:D] / denom).astype(o_ref.dtype)
    else:
        denom = jnp.sum(pb.astype(jnp.float32), axis=0, keepdims=True)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (ot / denom).astype(o_ref.dtype)


def pipe_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc, fold, mode):
    """3-stage pipelined transposed-PV kernel (exact or bound shift)."""
    def _stage_b(hh, q0, qcur, st):
        if "bound" in mode:
            kf32 = k_ref[hh].astype(jnp.float32)
            kms = jnp.max(jnp.sum(kf32 * kf32, axis=1))
            qf32 = qcur.astype(jnp.float32)
            q_sq = jnp.sum(qf32 * qf32, axis=1)
            m = (jnp.sqrt(q_sq * kms) * c - BOUND_SHIFT)[None, :]
        else:
            m = jnp.max(st, axis=0, keepdims=True) * c
        pb = jnp.exp2(st * c - m).astype(v_ref.dtype)
        ot = jax.lax.dot_general(v_ref[hh], pb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return hh, q0, pb, ot

    def _stage_c(hh, q0, pb, ot):
        denom = jnp.sum(pb.astype(jnp.float32), axis=0, keepdims=True)
        if "bound" in mode:
            denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[hh, :, q0:q0 + ot.shape[1]] = (ot / denom).astype(o_ref.dtype)

    qk_pend, bc_pend = [], []
    for hh in range(fold):
        for q0 in range(0, q_ref.shape[1], qc):
            qcur = q_ref[hh, q0:q0 + qc, :]
            st = jax.lax.dot_general(k_ref[hh], qcur,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            qk_pend.append((hh, q0, qcur, st))
            if len(qk_pend) > 1:
                bc_pend.append(_stage_b(*qk_pend.pop(0)))
            if len(bc_pend) > 1:
                _stage_c(*bc_pend.pop(0))
    for item in qk_pend:
        bc_pend.append(_stage_b(*item))
    for item in bc_pend:
        _stage_c(*item)


def make(mode, out_dtype, fold=1, qc=None):
    ones = "ones" in mode
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    dv = D + 8 if ones else D
    if "pipe" in mode:
        base = "bound" if "bound" in mode else "exact"
        kern = functools.partial(pipe_kernel, c=c, qc=qc or L, fold=fold,
                                 mode=base)
    else:
        kern = functools.partial(kernel, c=c, mode=mode, ones=ones)
        fold = 1
    return pl.pallas_call(
        kern,
        grid=(n_bh // fold,),
        in_specs=[
            pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((fold, L, dv), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((fold, D, L), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, D, L), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)
    vaug = jnp.concatenate([vf, jnp.ones((B * H, L, 8), jnp.bfloat16)],
                           axis=2)
    nref = 8
    ref = naive_attention(
        np.asarray(qf[:nref].astype(jnp.float32)),
        np.asarray(kf[:nref].astype(jnp.float32)),
        np.asarray(vf[:nref].astype(jnp.float32)),
    ).astype(np.float32)

    fns = []
    variants = [
        ("exact", 1, None), ("bound", 1, None),
        ("pipe_exact_f2_qc512", 2, 512),
        ("pipe_exact_f4_qc512", 4, 512),
        ("pipe_exact_f2_qc256", 2, 256),
        ("pipe_exact_f1_qc256", 1, 256),
        ("pipe_bound_f2_qc512", 2, 512),
    ]
    for mode, fold, qc in variants:
        vin = vaug if "ones" in mode else vf
        t0 = time.perf_counter()
        try:
            g = make(mode, jnp.float32, fold, qc)(qf, kf, vin).swapaxes(1, 2)
            err = float(jnp.max(jnp.abs(g[:nref] - jnp.asarray(ref))))
            kern = make(mode, jnp.bfloat16, fold, qc)

            def fn(q_, k_, v_, _kern=kern):
                o = _kern(q_, k_, v_)
                return q_ + (0.0 * o[:, 0:1, 0:1]).astype(q_.dtype)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        fns.append((mode, fn, vin))
        print(f"built {mode} in {time.perf_counter()-t0:.1f}s "
              f"max_abs(f32-out) {err:.2e}", flush=True)

    for mode, fn, vin in fns:
        secs = time_fn_chained_windows(fn, qf, kf, vin,
                                       n_long=N_LONG, windows=WINDOWS)
        vals = sorted(FLOPS / s / 1e12 for s in secs)
        med = vals[len(vals) // 2]
        print(f"{mode:12s}: min {vals[0]:6.1f} med {med:6.1f} "
              f"max {vals[-1]:6.1f} TF/s  ({100*med/ROOF:4.1f}% roof)",
              flush=True)


if __name__ == "__main__":
    main()
