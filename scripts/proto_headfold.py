#!/usr/bin/env python
"""Headline candidates, interleaved A/B (VERDICT r2 item 1a):
- bq 1024 / 512 / 256 one-pass grids (the autotune candidates);
- head-folding: one program computes 2 heads with both K/V resident
  (halves program count — tests the per-program pipeline-fill theory).
Every variant is compiled once; windows are sampled round-robin so
tunnel drift hits all variants equally; medians decide."""
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

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
N_LONG, N_SHORT = 24, 4


def _softmax_pv(q, k, v, c):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True) * c
    pb = jnp.exp2(s * c - m).astype(v.dtype)
    pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
    return pv / jnp.where(denom == 0.0, 1.0, denom)


def headfold_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc, fold):
    for hh in range(fold):
        k = k_ref[hh]
        v = v_ref[hh]
        for q0 in range(0, q_ref.shape[1], qc):
            q = q_ref[hh, q0:q0 + qc, :]
            o_ref[hh, q0:q0 + qc, :] = _softmax_pv(q, k, v, c).astype(
                o_ref.dtype)


def make_headfold(fold, qc=256):
    c = LOG2E / math.sqrt(D)
    n_prog = (B * H) // fold
    call = pl.pallas_call(
        functools.partial(headfold_kernel, c=c, qc=qc, fold=fold),
        grid=(n_prog,),
        in_specs=[pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )
    return call


def make_timers(fn):
    def chain(n):
        @jax.jit
        def run(x, *rest):
            def body(cy, _):
                return fn(cy, *rest), ()
            cy, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(cy.astype(jnp.float32))
        return run
    return chain(N_LONG), chain(N_SHORT)


def window(rl, rs, *args):
    shorts, longs = [], []
    for _ in range(2):
        t0 = time.perf_counter(); float(rs(*args))
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rl(*args))
        longs.append(time.perf_counter() - t0)
    return (min(longs) - min(shorts)) / (N_LONG - N_SHORT)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kb = jnp.asarray(k).astype(jnp.bfloat16)
    vb = jnp.asarray(v).astype(jnp.bfloat16)
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    qf = qb.reshape(B * H, L, D)
    kf = kb.reshape(B * H, L, D)
    vf = vb.reshape(B * H, L, D)

    paths = []
    for bq in (1024, 512, 256):
        cfg = TileConfig(block_q=bq, block_kv=1024)
        paths.append((f"bq{bq}", make_timers(
            lambda x, kk, vv, cfg=cfg: flash_attention_v1(
                x, kk, vv, config=cfg)), (qb, kb, vb)))
    for fold in (2, 4):
        call = make_headfold(fold)
        paths.append((f"fold{fold}", make_timers(call), (qf, kf, vf)))

    # correctness spot-check of the fold kernels vs the shipped kernel
    ref = np.asarray(flash_attention_v1(
        qb, kb, vb, out_dtype=jnp.float32)).reshape(B * H, L, D)
    for fold in (2, 4):
        got = np.asarray(make_headfold(fold)(qf, kf, vf)).astype(np.float32)
        err = np.max(np.abs(got - ref))
        print(f"fold{fold} vs shipped max_abs {err:.2e}", flush=True)
        assert err < 2e-2

    for name, (rl, rs), args in paths:
        t0 = time.perf_counter()
        float(rl(*args)); float(rs(*args))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {name: [] for name, _, _ in paths}
    for rep in range(5):
        for name, (rl, rs), args in paths:
            sec = window(rl, rs, *args)
            tf = FLOPS / sec / 1e12
            results[name].append(tf)
            print(f"rep{rep} {name:7s}: {sec*1e3:7.3f} ms {tf:6.1f} TF/s "
                  f"({100*tf/ROOF:4.1f}%)", flush=True)
    print()
    for name, vals in results.items():
        vals = sorted(vals)
        print(f"{name:7s}: min {vals[0]:6.1f}  med {vals[len(vals)//2]:6.1f}"
              f"  max {vals[-1]:6.1f} TF/s")


if __name__ == "__main__":
    main()
