#!/usr/bin/env python
"""A/B: true in-VMEM MXU throughput for the d=32 matmul shapes (VERDICT r1
item 3 evidence, replacing the HBM-contaminated scripts/ab_d32_bounds.py
rows — there the [BH,L,L] score tensor's HBM traffic dominated every
standalone row).

Method: one Pallas program per shape whose fori_loop accumulates G
INDEPENDENT dot_generals over VMEM-resident operand batches
(acc += A[i] @ B[i]); the only cross-iteration dependency is the
elementwise accumulate, so the MXU pipelines successive matmuls and the
measurement is throughput, not latency (a first cut chained each product
into the next operand and measured pipeline-drain latency instead:
full-tile came out 41 TFLOP/s — meaningless).

Questions this answers for the d=32 kernel design:
  1. [128,32]@[32,128]   — does contraction depth 32 run at 1/4 MXU rate?
  2. [512,32]@[32,512]   — same depth, larger M/N tile.
  3. [512,128]@[128,512] — the full-depth reference rate.
  4. [512,512]@[512,32]  — PV direct: 32 output lanes.
  5. [32,512]@[512,512]  — PV transposed (O^T = V^T P^T): M=32 streaming
     rows against full-depth weight tiles; if the MXU pipelines weight
     loads this runs ~4x faster per useful MAC than (4).

TFLOP/s figures count the exact-shape 2*M*K*N only.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained

G = 32          # independent operand pairs resident in VMEM
LOOPS = 16      # fori_loop sweeps over the G pairs


def make_kernel(m, k, n):
    def kernel(a_ref, b_ref, o_ref, acc_ref):
        def body(i, acc):
            g = jax.lax.rem(i, G)
            prod = jax.lax.dot_general(
                a_ref[g], b_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + prod

        acc = jax.lax.fori_loop(
            0, G * LOOPS, body, jnp.zeros((m, n), jnp.float32))
        o_ref[...] = acc.astype(jnp.bfloat16)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        )(a, b)

    return run


def bench(m, k, n, label):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((G, m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((G, k, n)), jnp.bfloat16)
    fn = make_kernel(m, k, n)

    def chained(a_, b_):
        # fold a scalar of the result back into the carry so the scan
        # serializes (time_fn_chained needs carry shape == a shape)
        s = (fn(a_, b_)[0, 0] * 1e-20).astype(a_.dtype)
        return a_ + s

    sec = time_fn_chained(chained, a, b, n_long=64, n_short=16, reps=4)
    flops = 2 * m * k * n * G * LOOPS
    tf = flops / sec / 1e12
    print(f"{label:44s} {sec*1e6:9.1f} us  {tf:7.1f} TFLOP/s "
          f"({tf/197*100:5.1f}% peak)")
    return tf


def main():
    print(f"{G} independent VMEM operand pairs x {LOOPS} sweeps, "
          "accumulated; useful-FLOP accounting\n")
    bench(512, 128, 512, "[512,128]@[128,512] full depth (reference)")
    bench(128, 128, 128, "[128,128]@[128,128] full, small tile")
    bench(128, 32, 128, "[128,32]@[32,128]   depth-32, small tile")
    bench(512, 32, 512, "[512,32]@[32,512]   depth-32 QK^T-like")
    bench(512, 64, 512, "[512,64]@[64,512]   depth-64")
    bench(512, 512, 32, "[512,512]@[512,32]  PV direct, 32 lanes")
    bench(512, 512, 64, "[512,512]@[512,64]  PV direct, 64 lanes")
    bench(32, 512, 512, "[32,512]@[512,512]  PV transposed, M=32")
    bench(512, 512, 128, "[512,512]@[512,128] PV full-lane reference")


if __name__ == "__main__":
    main()
