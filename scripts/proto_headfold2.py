#!/usr/bin/env python
"""Head-folding refinement: fold in {4, 8, 16} x q_chunk in {128, 256, 512}
(selected cells), interleaved medians."""
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

from exploring_flash_attention_tpu.oracle.reference import make_qkv, naive_attention
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


def make_headfold(fold, qc):
    c = LOG2E / math.sqrt(D)
    n_prog = (B * H) // fold
    return pl.pallas_call(
        functools.partial(headfold_kernel, c=c, qc=qc, fold=fold),
        grid=(n_prog,),
        in_specs=[pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((fold, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


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
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)

    cells = [(4, 256), (8, 256), (16, 256), (4, 512), (8, 512), (8, 128)]
    # gate each cell vs the f64 oracle on a slice (f32 readout)
    ref = naive_attention(
        *(np.asarray(x[:8].astype(jnp.float32)) for x in (qf, kf, vf)))
    paths = []
    for fold, qc in cells:
        call = make_headfold(fold, qc)
        got = np.asarray(call(qf, kf, vf)[:8]).astype(np.float32)
        err = np.max(np.abs(got - ref))
        print(f"fold{fold}_qc{qc}: oracle max_abs {err:.2e}", flush=True)
        paths.append((f"f{fold}q{qc}", make_timers(call), (qf, kf, vf)))

    for name, (rl, rs), args in paths:
        float(rl(*args)); float(rs(*args))
    print("compiled all", flush=True)

    results = {name: [] for name, _, _ in paths}
    for rep in range(5):
        for name, (rl, rs), args in paths:
            sec = window(rl, rs, *args)
            tf = FLOPS / sec / 1e12
            results[name].append(tf)
            print(f"rep{rep} {name:7s}: {tf:6.1f} TF/s ({100*tf/ROOF:4.1f}%)",
                  flush=True)
    print()
    for name, vals in results.items():
        vals = sorted(vals)
        print(f"{name:7s}: min {vals[0]:6.1f}  med {vals[len(vals)//2]:6.1f}"
              f"  max {vals[-1]:6.1f} TF/s")


if __name__ == "__main__":
    main()
