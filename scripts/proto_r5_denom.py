#!/usr/bin/env python
"""Round-5 headline attack #2: strength-reduce the EXACT path's denominator.

r4 ablation: exact kernel 151 TF/s, no_denom 164.9 — the denominator's
cross-lane shuffle reduce + [rows,1] broadcast divide cost ~9%.  Replace it:
  stage 1: pb.reshape(rows, 8, 128) summed over axis 1 in f32 — pure
           elementwise vreg adds, no shuffles;
  stage 2: contract the remaining 128 lanes on the MXU with a ones matrix
           (4 passes vs the strip's 64) — output arrives PRE-BROADCAST
           across all 128 lanes, so the divide is elementwise too.
Variants explore the stage-2 operand precision (bf16 single matmul vs
exact hi/lo split pair) and a loop-split scheduling form.

All fold4, qc512, direct orientation, exact max, f32 out for gating.
Also records the transposed bound+ones-row zero-reduction ceiling.
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

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
FOLD, QC = 4, 512
N_LONG = 96
WINDOWS = 6
BOUND_SHIFT = 64.0


def _denom_mxu(pb, ones_mat, exact_stage2):
    # stage 1: fold the Lkv lanes down to one 128-lane column by summing
    # 128-aligned lane slices — free vreg-column selections, no relayout
    # (a reshape(rows, 8, 128) here measured 68 TF/s: lanes->sublanes is a
    # full Mosaic relayout)
    r = functools.reduce(
        jnp.add,
        [pb[:, i:i + 128].astype(jnp.float32)
         for i in range(0, pb.shape[1], 128)])  # [rows, 128]
    if exact_stage2:
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d1 = jax.lax.dot_general(r_hi, ones_mat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d2 = jax.lax.dot_general(r_lo, ones_mat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return d1 + d2                          # [rows, 128] broadcast
    rb = r.astype(jnp.bfloat16)
    return jax.lax.dot_general(rb, ones_mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def kernel(q_ref, k_ref, v_ref, o_ref, *, c, mode, fold):
    ones_mat = jnp.ones((128, 128), jnp.bfloat16)
    for hh in range(fold):
        k = k_ref[hh]
        v = v_ref[hh]
        if mode == "split":
            pvs, pbs = [], []
        for q0 in range(0, q_ref.shape[1], QC):
            q = q_ref[hh, q0:q0 + QC, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if mode == "split":
                pvs.append(pv); pbs.append(pb)
                continue
            if mode == "full":
                denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            elif mode == "slice_only":
                r = functools.reduce(
                    jnp.add,
                    [pb[:, i:i + 128].astype(jnp.float32)
                     for i in range(0, pb.shape[1], 128)])
                denom = jnp.sum(r, axis=1, keepdims=True)
            else:
                denom = _denom_mxu(pb, ones_mat, mode == "mxu_exact")
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[hh, q0:q0 + QC, :] = (pv / denom).astype(o_ref.dtype)
        if mode == "split":
            for i, q0 in enumerate(range(0, q_ref.shape[1], QC)):
                denom = _denom_mxu(pbs[i], ones_mat, False)
                denom = jnp.where(denom == 0.0, 1.0, denom)
                o_ref[hh, q0:q0 + QC, :] = (pvs[i] / denom).astype(o_ref.dtype)


def t_bound_ones_kernel(q_ref, k_ref, v_ref, o_ref, *, c, fold):
    """Transposed + bound shift + ones-row denominator: ZERO Lkv reduces."""
    for hh in range(fold):
        k = k_ref[hh]
        v = v_ref[hh]                           # [Lkv, D+8], ones in D..D+7
        kf32 = k.astype(jnp.float32)
        kms = jnp.max(jnp.sum(kf32 * kf32, axis=1))
        for q0 in range(0, q_ref.shape[1], QC):
            q = q_ref[hh, q0:q0 + QC, :]
            st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            qf32 = q.astype(jnp.float32)
            q_sq = jnp.sum(qf32 * qf32, axis=1)
            m = (jnp.sqrt(q_sq * kms) * c - BOUND_SHIFT)[None, :]
            pb = jnp.exp2(st * c - m).astype(v.dtype)
            ot = jax.lax.dot_general(v, pb, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = ot[D:D + 1, :]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[hh, :, q0:q0 + QC] = (ot[:D] / denom).astype(o_ref.dtype)


def make(mode, out_dtype, fold=FOLD):
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    if mode == "t_bound_ones":
        kern = functools.partial(t_bound_ones_kernel, c=c, fold=fold)
        vshape, oshape = (fold, L, D + 8), (fold, D, L)
        out_shape = (n_bh, D, L)
    else:
        kern = functools.partial(kernel, c=c, mode=mode, fold=fold)
        vshape, oshape = (fold, L, D), (fold, L, D)
        out_shape = (n_bh, L, D)
    return pl.pallas_call(
        kern,
        grid=(n_bh // fold,),
        in_specs=[
            pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec(vshape, lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(oshape, lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
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
    )

    variants = [
        ("full", vf),
        ("mxu", vf),
        ("mxu_exact", vf),
        ("slice_only", vf),
        ("split", vf),
        ("t_bound_ones", vaug),
    ]
    fns = []
    for name, vin in variants:
        t0 = time.perf_counter()
        try:
            # gate with f32 out at fold2 (fold4 f32-out exceeds scoped VMEM)
            g = make(name, jnp.float32, fold=2)(qf, kf, vin)
            if name == "t_bound_ones":
                g = g.swapaxes(1, 2)
            err = float(jnp.max(jnp.abs(
                g[:nref] - jnp.asarray(ref, jnp.float32))))
            # time with bf16 out (the storage dtype)
            kern = make(name, jnp.bfloat16)
            if name == "t_bound_ones":
                fn = lambda q_, k_, v_, _kern=kern: (
                    q_ + (0.0 * _kern(q_, k_, v_)[:, 0:1, 0:1]).astype(q_.dtype))
            else:
                fn = kern
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        fns.append((name, fn, vin))
        print(f"built {name} in {time.perf_counter()-t0:.1f}s "
              f"max_abs(f32-out) {err:.2e}", flush=True)

    for name, fn, vin in fns:
        secs = time_fn_chained_windows(
            fn, qf, kf, vin, n_long=N_LONG, windows=WINDOWS)
        vals = sorted(FLOPS / s / 1e12 for s in secs)
        med = vals[len(vals) // 2]
        print(f"{name:14s}: min {vals[0]:6.1f} med {med:6.1f} "
              f"max {vals[-1]:6.1f} TF/s  ({100*med/ROOF:4.1f}% roof)",
              flush=True)


if __name__ == "__main__":
    main()
