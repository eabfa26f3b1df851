#!/usr/bin/env python
"""Round-2 one-pass hunt, part 4: isolate the denominator-after-PV win.

proto_onepass9's cost decomposition (measured, one process):
  mm 164.1 / mexp 163.1 / mmax 156.8 / full 159.8 TF/s (all qc=256)
The gate-correct "full" structure reached 81.1% of roofline — above the
157.6 TF/s target — while proto_onepass8's "bsum" (same arithmetic but
denominator summed BEFORE the PV matmul) sat at 144.7-151.8.  The deltas
between the two scripts: (a) denom summed after the PV dot_general so the
VPU reduction can overlap the MXU matmul; (b) K scaled by 0.05 in
onepass9 (should be timing-neutral).  This script separates them at real
scale with the accuracy gate, interleaved in one process:

  base  — shipped kernel structure (f32 p, denom before PV)
  postd — f32 p, denom AFTER the PV matmul (ordering only)
  full9 — bf16 p straight out of exp2, denom from bf16 p after PV
          (exactly onepass9's gate-correct winner)
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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc, variant):
    bq = q_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, qc):
        q = q_ref[0, q0:q0 + qc, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True) * c
        if variant == "full9":
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        elif variant == "postd":
            p = jnp.exp2(s * c - m)
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = jnp.sum(p, axis=1, keepdims=True)
        else:  # base: shipped ordering
            p = jnp.exp2(s * c - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)


def run_variant(name, qc, qkv, ref):
    qf, kf, vf = qkv
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    kernel = functools.partial(_kernel, c=c, qc=qc, variant=name)
    call = pl.pallas_call(
        kernel,
        grid=(n_bh, 1),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )

    out = np.asarray(call(qf, kf, vf).astype(jnp.float32))
    err = error_stats(out.reshape(B, H, L, D)[:1, :2], ref)["max_abs"]

    def step(x):
        return call(x, kf, vf)

    sec = time_fn_chained(step, qf)
    tflops = attention_flops(B, H, L, L, D) / sec / 1e12
    roof = roofline_attention_tflops(B, H, L, D)
    print(f"{name:6s} qc={qc:4d}: {sec*1e3:7.3f} ms  {tflops:6.1f} TF/s "
          f"({100*tflops/roof:4.1f}%)  max_abs={err:.2e}", flush=True)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)
    qkv = (qf, kf, vf)
    qs = np.asarray(qf.astype(jnp.float32)).reshape(B, H, L, D)
    ks = np.asarray(kf.astype(jnp.float32)).reshape(B, H, L, D)
    vs = np.asarray(vf.astype(jnp.float32)).reshape(B, H, L, D)
    ref = naive_attention(qs[:1, :2], ks[:1, :2], vs[:1, :2])
    for name, qc in [("base", 256), ("postd", 256), ("full9", 256),
                     ("base", 256), ("postd", 256), ("full9", 256)]:
        run_variant(name, qc, qkv, ref)


if __name__ == "__main__":
    main()
