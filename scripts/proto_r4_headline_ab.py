#!/usr/bin/env python
"""Paired A/B of the top round-4 headline variants: candidates alternate
window-by-window in ONE process so chip-regime drift cancels in the paired
comparison.  Chains are compiled once per candidate (chain 96 — the jitter-
immune length per scripts/probe_timing_variance.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops,
)
from scripts.proto_r4_headline import make_call, B, H, L, D

FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
WINDOWS = 8
N_LONG, N_SHORT = 96, 4


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

    cands = [
        ("fold4_qc256_hi", make_call(4, 256, True)),
        ("fold4_qc128_hi", make_call(4, 128, True)),
        ("fold2_qc256_hi", make_call(2, 256, True)),
        ("fold4_qc512_ho", make_call(4, 512, False)),
    ]
    timers = []
    for name, fn in cands:
        t0 = time.perf_counter()
        rl, rs = chain(fn, N_LONG), chain(fn, N_SHORT)
        float(rl(qf, kf, vf)); float(rs(qf, kf, vf))
        timers.append((name, rl, rs))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {name: [] for name, _, _ in timers}
    for w in range(WINDOWS):
        for name, rl, rs in timers:
            sec = window(rl, rs, qf, kf, vf)
            results[name].append(FLOPS / sec / 1e12)
        print(f"window {w}: " + "  ".join(
            f"{n.split('_', 1)[1]}={results[n][-1]:5.1f}"
            for n, _, _ in timers), flush=True)

    base = results[timers[0][0]]
    print()
    for name, _, _ in timers:
        vals = sorted(results[name])
        med = vals[len(vals) // 2]
        ratios = sorted(r / b for r, b in zip(results[name], base))
        print(f"{name}: med {med:6.1f} TF/s ({100*med/ROOF:4.1f}%) "
              f"paired-vs-{timers[0][0]} med ratio "
              f"{ratios[len(ratios)//2]:.3f}", flush=True)


if __name__ == "__main__":
    main()
