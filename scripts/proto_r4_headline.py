#!/usr/bin/env python
"""Round-4 headline sweep under the ROBUST timer (chain auto-calibrated to
~0.2 s long calls — scripts/probe_timing_variance.py showed the old 24-chain
protocol's 127-183 TF/s spread collapses to ~3% at chain 96+).

Variants on the one-pass fold kernel at B=32,H=8,L=1024,d=128:
  - head-loop order: heads-outer (shipping) vs strips-outer/heads-inner
    (the interleave that bought +38% on the causal kernel: head A's VPU
    softmax overlaps head B's MXU matmul)
  - fold 2/4/8 (8 exceeds ONEPASS_MAX_KV_ELEMS but fits VMEM: K/V 4 MB +
    q/out 4 MB + strips ~2 MB)
  - q_chunk 128/256/512
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

from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained_windows,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)


def fold_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc, fold, heads_inner):
    bq = q_ref.shape[1]

    def strip(hh, q0):
        q = q_ref[hh, q0:q0 + qc, :]
        k = k_ref[hh]
        v = v_ref[hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True) * c
        pb = jnp.exp2(s * c - m).astype(v.dtype)
        pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[hh, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)

    if heads_inner:
        for q0 in range(0, bq, qc):
            for hh in range(fold):
                strip(hh, q0)
    else:
        for hh in range(fold):
            for q0 in range(0, bq, qc):
                strip(hh, q0)


def make_call(fold, qc, heads_inner):
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    return pl.pallas_call(
        functools.partial(fold_kernel, c=c, qc=qc, fold=fold,
                          heads_inner=heads_inner),
        grid=(n_bh // fold,),
        in_specs=[pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)

    variants = []
    for fold in (4, 8):
        for qc in (256, 512):
            for hi in (False, True):
                variants.append((f"fold{fold}_qc{qc}_{'hi' if hi else 'ho'}",
                                 fold, qc, hi))

    results = []
    for name, fold, qc, hi in variants:
        try:
            fn = make_call(fold, qc, hi)
            secs = time_fn_chained_windows(fn, qf, kf, vf, windows=3, reps=2)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}", flush=True)
            continue
        tfs = sorted(FLOPS / s / 1e12 for s in secs)
        med = tfs[len(tfs) // 2]
        results.append((med, name, tfs))
        print(f"{name:18s}: min {tfs[0]:6.1f} med {med:6.1f} "
              f"max {tfs[-1]:6.1f} TF/s ({100*med/ROOF:4.1f}%)", flush=True)

    results.sort(reverse=True)
    print("\ntop 5:")
    for med, name, tfs in results[:5]:
        print(f"  {name:18s} med {med:6.1f} ({100*med/ROOF:4.1f}%)")


if __name__ == "__main__":
    main()
