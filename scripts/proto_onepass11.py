#!/usr/bin/env python
"""Round-2 one-pass hunt, part 5: where does the last 17% live?

proto_onepass10 verdict: softmax ordering is timing-neutral (Mosaic
schedules the chain; base/postd/full9 all within +-7% tunnel noise).
proto_onepass9's decomposition says the gate-correct kernel runs at
~97% of the pure-matmul 'mm' structure (QK^T -> cast -> PV), so the
remaining gap to the 80%-of-197 target is the mm ceiling itself.

This sweep locates that ceiling:
  xmm    — ONE big plain XLA bf16 matmul (4096^3): the practical MXU
           peak through this whole stack (jit + tunnel).  If this lands
           at ~83% too, 197 is simply not attainable and the bound
           analysis closes VERDICT #1's alternative.
  mm     — Pallas mm control (bq=1024, qc=256), same as proto_onepass9.
  mm512 / mm256 — mm with the Q block split at the GRID level into
           2/4 programs per (b,h): deeper cross-program pipelining,
           earlier output DMA flush; K/V BlockSpec index repeats so the
           fetch is elided.
  f9b512 — gate-correct full9 at the best granularity, for the ship
           decision.
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
        if variant == "mm":
            pb = s.astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + qc, :] = pv.astype(o_ref.dtype)
        else:  # full9
            m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[0, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)


def run_pallas(name, bq, qc, qkv, ref):
    qf, kf, vf = qkv
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    n_q = L // bq
    variant = "mm" if name.startswith("mm") else "full9"
    kernel = functools.partial(_kernel, c=c, qc=min(qc, bq), variant=variant)
    call = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )

    if variant == "full9":
        out = np.asarray(call(qf, kf, vf).astype(jnp.float32))
        err = error_stats(out.reshape(B, H, L, D)[:1, :2], ref)["max_abs"]
        errtxt = f"max_abs={err:.2e}"
    else:
        errtxt = "(numerically fake)"

    def step(x):
        return call(x, kf, vf)

    sec = time_fn_chained(step, qf)
    tflops = attention_flops(B, H, L, L, D) / sec / 1e12
    roof = roofline_attention_tflops(B, H, L, D)
    print(f"{name:7s} bq={bq:4d}: {sec*1e3:7.3f} ms  {tflops:6.1f} TF/s "
          f"({100*tflops/roof:4.1f}%)  {errtxt}", flush=True)


def run_xla_matmul(n=4096):
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)),
                    jnp.bfloat16)

    def step(x):
        # same shape/dtype in and out so the chain carries
        return jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16)

    sec = time_fn_chained(step, a)
    tflops = 2 * n * n * n / sec / 1e12
    print(f"xmm    n={n:5d}: {sec*1e3:7.3f} ms  {tflops:6.1f} TF/s "
          f"({100*tflops/197.0:4.1f}% of 197)", flush=True)


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
    run_xla_matmul(4096)
    run_pallas("mm", 1024, 256, qkv, ref)
    run_pallas("mm512", 512, 256, qkv, ref)
    run_pallas("mm256", 256, 256, qkv, ref)
    run_pallas("f9b512", 512, 256, qkv, ref)
    run_pallas("mm", 1024, 256, qkv, ref)   # drift check
    run_xla_matmul(4096)


if __name__ == "__main__":
    main()
