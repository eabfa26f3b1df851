#!/usr/bin/env python
"""Round-2 one-pass micro-opt hunt at the canonical headline shape.

Variants (all strip-mined single-softmax, grid (B*H, 1), KV resident):
  base      — the shipped kernel structure (s*c fused in exp arg)
  presc     — fold c = scale*log2e into Q once per strip (bf16 prescale):
              removes one full-width VPU multiply pass per strip
  presc32   — same but prescale in f32 before the matmul cast decision
  fori      — prescale + lax.fori_loop over strips (1 live score buffer)
  qc128/512 — prescale at other strip widths
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

    def strip(q, out_slice):
        # q already carries the scale for presc variants
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if variant == "base":
            m = jnp.max(s, axis=1, keepdims=True) * c
            p = jnp.exp2(s * c - m)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, out_slice, :] = (
            pv / jnp.where(denom == 0.0, 1.0, denom)).astype(o_ref.dtype)

    if variant == "fori":
        def body(i, _):
            q = q_ref[0, pl.ds(i * qc, qc), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, pl.ds(i * qc, qc), :] = (
                pv / jnp.where(denom == 0.0, 1.0, denom)).astype(o_ref.dtype)
            return 0
        jax.lax.fori_loop(0, bq // qc, body, 0)
    else:
        for q0 in range(0, bq, qc):
            strip(q_ref[0, q0:q0 + qc, :], slice(q0, q0 + qc))


def run_variant(name, qc, qkv):
    qf, kf, vf = qkv
    scale = 1.0 / math.sqrt(D)
    c = scale * LOG2E
    n_bh = B * H

    if name == "base":
        q_in = qf
    elif name == "presc32":
        q_in = (qf.astype(jnp.float32) * c).astype(jnp.bfloat16)
    else:
        q_in = qf * jnp.bfloat16(c)

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

    # accuracy spot-check vs jnp reference at this shape (bf16 tolerance)
    out = np.asarray(call(q_in, kf, vf).astype(jnp.float32))
    qs = np.asarray(qf.astype(jnp.float32)).reshape(B, H, L, D)
    ks = np.asarray(kf.astype(jnp.float32)).reshape(B, H, L, D)
    vs = np.asarray(vf.astype(jnp.float32)).reshape(B, H, L, D)
    ref = naive_attention(qs[:1, :2], ks[:1, :2], vs[:1, :2])
    err = error_stats(out.reshape(B, H, L, D)[:1, :2], ref)["max_abs"]

    def step(x):
        return call(x, kf, vf)

    sec = time_fn_chained(step, q_in)
    tflops = attention_flops(B, H, L, L, D) / sec / 1e12
    roof = roofline_attention_tflops(B, H, L, D)
    print(f"{name:9s} qc={qc:4d}: {sec*1e3:7.3f} ms  {tflops:6.1f} TF/s "
          f"({100*tflops/roof:4.1f}%)  max_abs={err:.2e}", flush=True)
    return tflops


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)
    qkv = (qf, kf, vf)
    for name, qc in [("base", 256), ("presc", 256), ("presc32", 256),
                     ("fori", 256), ("presc", 128), ("presc", 512)]:
        run_variant(name, qc, qkv)


if __name__ == "__main__":
    main()
