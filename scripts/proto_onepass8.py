#!/usr/bin/env python
"""Round-2 one-pass hunt, part 2: gate-safe VPU/VMEM-pass reductions.

proto_onepass7 verdict: prescaling Q by c=scale*log2e in bf16 gains ~4%
but breaks the 1e-3 gate (max_abs 2.9e-3) — the scale must stay inside
the f32 score pipeline.  qc=256 confirmed optimal; fori_loop strip reuse
loses 9% (Mosaic pipelines the unrolled form better).

This sweep attacks the softmax's VMEM traffic instead, keeping s*c-m in
f32 exactly as shipped:
  base   — shipped structure (f32 p materialized, then cast for PV)
  bsum   — p cast to bf16 straight out of exp2; denominator summed from
           the SAME bf16 p (f32 accumulate).  Never materializes f32 p:
           softmax passes drop from read s, read s/write p32, read p32,
           read p32/write p16 to read s, read s/write p16, read p16.
           Numerator (PV uses bf16 p already) and denominator also become
           consistent, so rounding partially cancels in O = num/denom.
  brecip — bsum + explicit reciprocal-multiply normalize
  bsum512— bsum at qc=512 (lighter VPU may shift the strip optimum)
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
        if variant == "base":
            p = jnp.exp2(s * c - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            pb = p.astype(v.dtype)
        else:
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        if variant == "brecip":
            o_ref[0, q0:q0 + qc, :] = (
                pv * (1.0 / denom)).astype(o_ref.dtype)
        else:
            o_ref[0, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)


def run_variant(name, qc, qkv, ref):
    qf, kf, vf = qkv
    scale = 1.0 / math.sqrt(D)
    c = scale * LOG2E
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
    print(f"{name:9s} qc={qc:4d}: {sec*1e3:7.3f} ms  {tflops:6.1f} TF/s "
          f"({100*tflops/roof:4.1f}%)  max_abs={err:.2e}", flush=True)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)
    qkv = (qf, kf, vf)
    # f64-quality reference on the first 2 heads for the accuracy readout
    qs = np.asarray(qf.astype(jnp.float32)).reshape(B, H, L, D)
    ks = np.asarray(kf.astype(jnp.float32)).reshape(B, H, L, D)
    vs = np.asarray(vf.astype(jnp.float32)).reshape(B, H, L, D)
    ref = naive_attention(qs[:1, :2], ks[:1, :2], vs[:1, :2])
    for name, qc in [("base", 256), ("bsum", 256), ("brecip", 256),
                     ("bsum", 512), ("base", 256), ("bsum", 256)]:
        run_variant(name, qc, qkv, ref)


if __name__ == "__main__":
    main()
