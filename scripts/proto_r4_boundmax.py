#!/usr/bin/env python
"""Round-4 prototype: replace the softmax's per-row LANE max-reduction
(~9% of headline wall time per scripts/ab_r4_vpu_ablate.py) with a
rigorous Cauchy-Schwarz upper bound m_i = ||q_i|| * max_j ||k_j|| * c.

Why this is exact: softmax is shift-invariant — exp2(s - m)/sum(exp2(s - m))
is independent of m in exact arithmetic, and in f32 every p keeps the same
RELATIVE precision at any scale, so accuracy is unchanged.  Why it is safe:
m_bound >= true row max (Cauchy-Schwarz), so p <= 1 — overflow impossible.
The only risk is the bound being loose by >126 bits (norm product ~1000x
the true max dot at d=128), flushing ALL of a row to subnormal zero; a
denom==0 guard falls back to the exact-max path for that strip (rare
branch, never taken on sane data).

K norms are computed ONCE per head and amortize over all q strips; q norms
are one cheap d-lane reduce per strip (128 lanes vs the 1024-lane score
reduce they replace).
"""
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

from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
FOLD, QC = 4, 512
N_LONG, N_SHORT = 96, 4
WINDOWS = 6


def kernel(q_ref, k_ref, v_ref, o_ref, *, c, mode, fold=None):
    for hh in range(fold or FOLD):
        k = k_ref[hh]
        v = v_ref[hh]
        if mode.startswith("bound"):
            kf32 = k.astype(jnp.float32)
            k_max_sq = jnp.max(jnp.sum(kf32 * kf32, axis=1))   # scalar
        for q0 in range(0, q_ref.shape[1], QC):
            q = q_ref[hh, q0:q0 + QC, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if mode == "bound96":
                qf32 = q.astype(jnp.float32)
                q_sq = jnp.sum(qf32 * qf32, axis=1, keepdims=True)
                # offset 96: p <= 2^96 (overflow-free: sum <= 2^106),
                # all-row underflow needs the bound loose by >222 bits
                m = jnp.sqrt(q_sq * k_max_sq) * c - 96.0
            elif mode.startswith("bound"):
                qf32 = q.astype(jnp.float32)
                q_sq = jnp.sum(qf32 * qf32, axis=1, keepdims=True)
                m = jnp.sqrt(q_sq * k_max_sq) * c               # [rows, 1]
            else:
                m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            if mode == "bound_guard":
                def exact():
                    me = jnp.max(s, axis=1, keepdims=True) * c
                    pe = jnp.exp2(s * c - me).astype(v.dtype)
                    pve = jax.lax.dot_general(
                        pe, v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    de = jnp.sum(pe.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    return pve / jnp.where(de == 0.0, 1.0, de)

                def cheap():
                    return pv / jnp.where(denom == 0.0, 1.0, denom)

                o = jax.lax.cond(jnp.any(denom == 0.0), exact, cheap)
            else:
                o = pv / jnp.where(denom == 0.0, 1.0, denom)
            o_ref[hh, q0:q0 + QC, :] = o.astype(o_ref.dtype)


def make(mode):
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    return pl.pallas_call(
        functools.partial(kernel, c=c, mode=mode),
        grid=(n_bh // FOLD,),
        in_specs=[pl.BlockSpec((FOLD, L, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((FOLD, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, L, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


def chain(fn, n):
    @jax.jit
    def run(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))
    return run


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

    # accuracy first: f32-out gate (the driver protocol) vs f64 oracle
    import functools as ft
    def make_f32(mode):
        # fold2: fold4 with f32 output blocks is the known 17.2M VMEM OOM
        # boundary — the library launcher folds down for f32 out the same
        # way; the bound-softmax numerics are identical at any fold
        cc = LOG2E / math.sqrt(D)
        n_bh = B * H
        return pl.pallas_call(
            ft.partial(kernel, c=cc, mode=mode, fold=2),
            grid=(n_bh // 2,),
            in_specs=[pl.BlockSpec((2, L, D), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((2, L, D), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bh, L, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )
    ref = naive_attention(
        *(np.asarray(x[:4].astype(jnp.float32)) for x in (qf, kf, vf)))
    for mode in ("full", "bound96"):
        out = np.asarray(make_f32(mode)(qf, kf, vf))[:4]
        stats = error_stats(out, ref)
        print(f"{mode} f32-out accuracy: max_abs {stats['max_abs']:.2e} "
              f"(gate 1e-3)", flush=True)

    modes = ["full", "bound", "bound96"]
    timers = []
    for mode in modes:
        t0 = time.perf_counter()
        fn = make(mode)
        rl, rs = chain(fn, N_LONG), chain(fn, N_SHORT)
        float(rl(qf, kf, vf)); float(rs(qf, kf, vf))
        timers.append((mode, rl, rs))
        print(f"compiled {mode} in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {m: [] for m, _, _ in timers}
    for w in range(WINDOWS):
        for mode, rl, rs in timers:
            sec = window(rl, rs, qf, kf, vf)
            results[mode].append(FLOPS / sec / 1e12)

    base = sorted(results["full"])[WINDOWS // 2]
    for mode in modes:
        vals = sorted(results[mode])
        med = vals[len(vals) // 2]
        print(f"{mode:12s}: med {med:6.1f} TF/s ({100*med/ROOF:4.1f}%) "
              f"= {med/base:5.3f}x full  [ms {FLOPS/med/1e9:.3f}]",
              flush=True)


if __name__ == "__main__":
    main()
