#!/usr/bin/env python
"""Where does the headline kernel's 23% gap to MXU peak go?  Ablate the
softmax's VPU passes one at a time (measurement-only variants — some are
numerically unsafe) under the chain-96 paired protocol.  fold4 qc512
heads-outer base (151.5 TF/s med, scripts/proto_r4_headline_ab.py)."""
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

from exploring_flash_attention_tpu.oracle.reference import make_qkv
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


def kernel(q_ref, k_ref, v_ref, o_ref, *, c, mode):
    for hh in range(FOLD):
        k = k_ref[hh]
        v = v_ref[hh]
        for q0 in range(0, q_ref.shape[1], QC):
            q = q_ref[hh, q0:q0 + QC, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if mode == "matmul_only":
                pb = s.astype(v.dtype)
            elif mode == "no_max":
                pb = jnp.exp2(s * c).astype(v.dtype)
            elif mode == "no_exp":
                m = jnp.max(s, axis=1, keepdims=True) * c
                pb = (s * c - m).astype(v.dtype)
            else:
                m = jnp.max(s, axis=1, keepdims=True) * c
                p = jnp.exp2(s * c - m)
                pb = p.astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if mode in ("full", "no_max", "no_exp"):
                denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
                denom = jnp.where(denom == 0.0, 1.0, denom)
                pv = pv / denom
            elif mode == "full_f32denom":
                denom = jnp.sum(p, axis=1, keepdims=True)
                denom = jnp.where(denom == 0.0, 1.0, denom)
                pv = pv / denom
            # no_denom / matmul_only: skip normalize
            o_ref[hh, q0:q0 + QC, :] = pv.astype(o_ref.dtype)


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

    modes = ["full", "no_denom", "no_max", "matmul_only"]
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
        print(f"window {w} done", flush=True)

    base = sorted(results["full"])[WINDOWS // 2]
    for mode in modes:
        vals = sorted(results[mode])
        med = vals[len(vals) // 2]
        print(f"{mode:14s}: med {med:6.1f} TF/s ({100*med/ROOF:4.1f}%) "
              f"= {med/base:5.3f}x full  [ms {FLOPS/med/1e9:.3f}]",
              flush=True)


if __name__ == "__main__":
    main()
