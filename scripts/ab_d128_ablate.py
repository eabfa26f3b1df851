#!/usr/bin/env python
"""Ablation breakdown of the d=128 one-pass kernel (VERDICT r1 item 1
evidence): time kernel variants with pieces surgically removed to see
where the 0.93 ms at the canonical shape goes (MXU floor is 0.70 ms).

Variants (all same grid/BlockSpecs as the production kernel):
  full          — the production strip-mined one-pass softmax
  noscale       — q pre-scaled by c outside (kills the s*c VPU pass)
  nomax         — m := 0 (kills the max-reduce pass; wrong numerics)
  nosum         — denom := 1 (kills the sum-reduce pass; wrong numerics)
  noexp         — p := s (kills exp2; wrong numerics)
  mm-only       — p := cast(s) (matmuls + cast only)
  noqk          — s := broadcast(q-chunk) (PV + softmax only)

Each removed piece's cost = full - variant (to first order; overlap makes
the sum of pieces exceed the total).
"""

import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from exploring_flash_attention_tpu.ops.attention_v1 import LOG2E
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops,
    time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
BH = B * H
Q_CHUNK = 256
SCALE = 1.0 / math.sqrt(D)


def make_kernel(variant):
    def kern(q_ref, k_ref, v_ref, o_ref):
        c = SCALE * LOG2E
        k = k_ref[0]
        v = v_ref[0]
        for q0 in range(0, L, Q_CHUNK):
            q = q_ref[0, q0:q0 + Q_CHUNK, :]
            if variant == "noqk":
                s = jnp.broadcast_to(
                    q[:, :1].astype(jnp.float32), (Q_CHUNK, L)) * 1.0
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if variant == "mm-only":
                p = s.astype(v.dtype)
                denom = 1.0
            else:
                if variant == "nomax":
                    m = 0.0
                else:
                    m = jnp.max(s, axis=1, keepdims=True) * (
                        1.0 if variant == "noscale" else c)
                if variant == "noscale":
                    arg = s - m
                else:
                    arg = s * c - m
                if variant == "noexp":
                    pf = arg
                else:
                    pf = jnp.exp2(arg)
                if variant == "nosum":
                    denom = 1.0
                else:
                    denom = jnp.sum(pf, axis=1, keepdims=True)
                    denom = jnp.where(denom == 0.0, 1.0, denom)
                p = pf.astype(v.dtype)
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + Q_CHUNK, :] = (pv / denom).astype(o_ref.dtype)

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(BH, 1),
            in_specs=[
                pl.BlockSpec((1, L, D), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, L, D), lambda bh, qi: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, L, D), jnp.bfloat16),
        )(q, k, v)

    return fn


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, L, D)), jnp.bfloat16)
    fl = attention_flops(B, H, L, L, D)
    base = None
    for variant in ("full", "noscale", "nomax", "nosum", "noexp",
                    "mm-only", "noqk"):
        fn = make_kernel(variant)
        sec = time_fn_chained(lambda a, b, c_: fn(a, b, c_), q, k, v,
                              n_long=32, n_short=8, reps=3)
        if variant == "full":
            base = sec
        delta = "" if base is None or variant == "full" else (
            f"  (saves {max(base-sec,0)*1e3:.3f} ms)")
        print(f"{variant:10s} {sec*1e3:7.3f} ms  {fl/sec/1e12:6.1f} TF{delta}")


if __name__ == "__main__":
    main()
