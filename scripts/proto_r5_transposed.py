#!/usr/bin/env python
"""Round-5 headline attack: transposed-orientation d=128 one-pass kernel.

Round-4's ablation (scripts/ab_r4_vpu_ablate.py) showed the exact kernel
with BOTH lane reductions (row max + denominator) runs ~151 TF/s while any
single-reduction variant runs ~165: the two cross-lane shuffle reduces
serialize against the MXU.  Hypothesis: compute scores TRANSPOSED
(S^T = K @ Q-strip^T, Lkv on sublanes) as the d=32 kernel already does
(ops/attention_v1.py:_v1_onepass_kernel_pvt) so both softmax reductions
become sublane reduces (elementwise vreg ops, no cross-lane shuffles), and
optionally fold the denominator into the PV matmul via a ones-row appended
to V (output M 128->136, +8 sublanes).

Variants (all fold4 over B*H=256 heads, L=1024, d=128 bf16):
  base        direct orientation, exact softmax (shipped r4 kernel form)
  t_exact     transposed, exact max (sublane reduces), out [n_bh, D, L]
  t_exact_sw  t_exact + XLA swapaxes back to [n_bh, L, D] (standard layout)
  t_ones      transposed, exact max, denominator via ones-row in V (M=136)
  t_ones_sw   t_ones + swapaxes
  t_bound     transposed, Cauchy-Schwarz bound shift (no max reduce at all)
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
    attention_flops, roofline_attention_tflops,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
FOLD = 4
N_LONG, N_SHORT = 96, 4
WINDOWS = 6
BOUND_SHIFT = 64.0


def base_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc):
    for hh in range(FOLD):
        k = k_ref[hh]
        v = v_ref[hh]
        for q0 in range(0, q_ref.shape[1], qc):
            q = q_ref[hh, q0:q0 + qc, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[hh, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)


def t_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc, mode):
    """Transposed orientation: S^T [Lkv, rows], reductions over sublanes."""
    for hh in range(FOLD):
        k = k_ref[hh]                                  # [Lkv, D(+pad)]
        v = v_ref[hh]
        kms = None
        if mode == "bound":
            kf32 = k.astype(jnp.float32)
            kms = jnp.max(jnp.sum(kf32 * kf32, axis=1))
        for q0 in range(0, q_ref.shape[1], qc):
            q = q_ref[hh, q0:q0 + qc, :]
            st = jax.lax.dot_general(k[:, :D] if mode == "ones" else k,
                                     q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # st: [Lkv, rows]
            if mode == "bound":
                qf32 = q.astype(jnp.float32)
                q_sq = jnp.sum(qf32 * qf32, axis=1)    # [rows]
                m = (jnp.sqrt(q_sq * kms) * c - BOUND_SHIFT)[None, :]
            else:
                m = jnp.max(st, axis=0, keepdims=True) * c   # sublane reduce
            pb = jnp.exp2(st * c - m).astype(v.dtype)   # [Lkv, rows]
            ot = jax.lax.dot_general(v, pb, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if mode == "ones":
                # v is [Lkv, D+8] with columns D..D+7 all ones: output row D
                # is the denominator, computed by the same MXU pass
                denom = ot[D:D + 1, :]
                denom = jnp.where(denom == 0.0, 1.0, denom)
                o_ref[hh, :, q0:q0 + qc] = (ot[:D] / denom).astype(o_ref.dtype)
            else:
                denom = jnp.sum(pb.astype(jnp.float32), axis=0, keepdims=True)
                denom = jnp.where(denom == 0.0, 1.0, denom)
                o_ref[hh, :, q0:q0 + qc] = (ot / denom).astype(o_ref.dtype)


def make(variant, qc):
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    if variant == "base":
        kern = functools.partial(base_kernel, c=c, qc=qc)
        vshape, oshape = (FOLD, L, D), (FOLD, L, D)
        out_shape = (n_bh, L, D)
    else:
        mode = {"t_exact": "exact", "t_ones": "ones",
                "t_bound": "bound"}[variant]
        kern = functools.partial(t_kernel, c=c, qc=qc, mode=mode)
        dv = D + 8 if mode == "ones" else D
        vshape, oshape = (FOLD, L, dv), (FOLD, D, L)
        out_shape = (n_bh, D, L)
    return pl.pallas_call(
        kern,
        grid=(n_bh // FOLD,),
        in_specs=[
            pl.BlockSpec((FOLD, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((FOLD, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec(vshape, lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(oshape, lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)
    ones = jnp.ones((B * H, L, 8), jnp.bfloat16)
    vaug = jnp.concatenate([vf, ones], axis=2)

    # accuracy gate on a [2,2] slice vs f64 oracle
    ref = naive_attention(
        np.asarray(qf[:4].astype(jnp.float32)).reshape(2, 2, L, D),
        np.asarray(kf[:4].astype(jnp.float32)).reshape(2, 2, L, D),
        np.asarray(vf[:4].astype(jnp.float32)).reshape(2, 2, L, D),
    ).reshape(4, L, D)

    from exploring_flash_attention_tpu.utils.benchmark import (
        time_fn_chained_windows,
    )

    def wrap(key, qc, swap):
        kern = make(key, qc)
        if key == "base":
            return kern
        if swap:
            return lambda q, k, v: kern(q, k, v).swapaxes(1, 2)
        # keep carry shape without materializing the transpose: fold a
        # broadcastable slice of the output into q (one cheap fused op)
        def fn(q, k, v):
            o = kern(q, k, v)
            return q + (0.0 * o[:, 0:1, 0:1]).astype(q.dtype)
        return fn

    variants = [
        ("base", "base", 512, vf, False),
        ("t_exact", "t_exact", 512, vf, False),
        ("t_exact_sw", "t_exact", 512, vf, True),
        ("t_ones", "t_ones", 512, vaug, False),
        ("t_ones_sw", "t_ones", 512, vaug, True),
        ("t_bound", "t_bound", 512, vf, False),
        ("t_bound_sw", "t_bound", 512, vf, True),
        ("t_exact_qc256", "t_exact", 256, vf, False),
    ]
    fns = []
    for name, key, qc, vin, swap in variants:
        t0 = time.perf_counter()
        try:
            kern = make(key, qc)
            out = kern(qf, kf, vin)
            if key != "base":
                out = out.swapaxes(1, 2)
            err = float(jnp.max(jnp.abs(
                out[:4].astype(jnp.float32) - jnp.asarray(ref, jnp.float32))))
            fn = wrap(key, qc, swap)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        fns.append((name, fn, vin))
        print(f"built {name} in {time.perf_counter()-t0:.1f}s "
              f"max_abs(bf16-out) {err:.2e}", flush=True)

    for name, fn, vin in fns:
        secs = time_fn_chained_windows(
            fn, qf, kf, vin, n_long=N_LONG, windows=WINDOWS)
        vals = sorted(FLOPS / s / 1e12 for s in secs)
        med = vals[len(vals) // 2]
        print(f"{name:16s}: min {vals[0]:6.1f} med {med:6.1f} "
              f"max {vals[-1]:6.1f} TF/s  ({100*med/ROOF:4.1f}% roof)",
              flush=True)


if __name__ == "__main__":
    main()
