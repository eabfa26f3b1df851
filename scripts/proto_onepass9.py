#!/usr/bin/env python
"""Cost decomposition of the one-pass kernel at the headline shape.

Ablates the softmax piece by piece while keeping the exact grid, block
and matmul structure, to locate the kernel's structural ceiling on this
chip: how fast can (QK^T -> [VPU work] -> PV) go when the VPU work is
  mm    — nothing at all (p = s cast to bf16): pure MXU + cast ceiling
  mexp  — exp2 only, no max / no sum (numerically wrong, structurally equal)
  mmax  — max + exp2, no sum
  full  — max + exp2 + sum + normalize (= the bsum kernel, gate-correct)

The gap full-vs-mm is the total softmax tax; the per-step deltas assign
it to max / exp2 / sum.  If even `mm` lands below the 80%-of-roofline
target, the target is structurally unreachable in this one-kernel form
and the bound analysis goes to docs/ (VERDICT r1 item 1's alternative).
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
        elif variant == "mexp":
            pb = jnp.exp2(s * c).astype(v.dtype)
        else:
            m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
        pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if variant == "full":
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[0, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)
        else:
            o_ref[0, q0:q0 + qc, :] = pv.astype(o_ref.dtype)


def run_variant(name, qc, qkv):
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

    def step(x):
        return call(x, kf, vf)

    sec = time_fn_chained(step, qf)
    tflops = attention_flops(B, H, L, L, D) / sec / 1e12
    roof = roofline_attention_tflops(B, H, L, D)
    print(f"{name:5s} qc={qc:4d}: {sec*1e3:7.3f} ms  {tflops:6.1f} TF/s "
          f"({100*tflops/roof:4.1f}%)", flush=True)
    return sec


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    # tame the fake-softmax magnitudes so mexp/mm don't overflow
    kf = (jnp.asarray(k) * 0.05).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)
    qkv = (qf, kf, vf)
    for name, qc in [("mm", 256), ("mexp", 256), ("mmax", 256),
                     ("full", 256), ("mm", 512), ("mm", 1024)]:
        run_variant(name, qc, qkv)


if __name__ == "__main__":
    main()
