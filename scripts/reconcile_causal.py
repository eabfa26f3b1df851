#!/usr/bin/env python
"""VERDICT r3 item 4: settle causal 137-proto vs 103-suite.  Interleave,
in ONE process under the calibrated chain-96 protocol: the suite's causal
path (flash_attention_v1 causal=True, exact softmax), the r3 proto kernel
(proto_causal_fast3.band_causal — the source of the 137 claim), and the
round-4 causal bound-softmax path."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import attention_flops

B, H, L, D = 32, 8, 1024, 128
FLOPS = attention_flops(B, H, L, L, D, causal=True)
N_LONG, N_SHORT = 96, 4
WINDOWS = 6


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
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    kf = kd.reshape(B * H, L, D)
    vf = vd.reshape(B * H, L, D)

    # r3 proto kernel, loaded the way proto_headline_hi.py does
    proto_path = os.path.join(os.path.dirname(__file__),
                              "proto_causal_fast3.py")
    _ns = {"__file__": proto_path}
    src = open(proto_path).read()
    src = src.split("\nB, H, L, D")[0]     # defs only, not its own bench
    exec(compile(src, "proto_causal_fast3.py", "exec"), _ns)  # noqa: S102
    band_causal = _ns["band_causal"]
    scale = 1.0 / math.sqrt(D)

    cfg_e = TileConfig(block_q=1024, block_kv=1024)
    cfg_b = TileConfig(block_q=1024, block_kv=1024, softmax="bound")

    paths = [
        ("suite_exact", lambda x, kk, vv: flash_attention_v1(
            x, kk, vv, config=cfg_e, causal=True), (q0, kd, vd)),
        ("proto_r3", lambda x, kk, vv: band_causal(
            x.reshape(B * H, L, D), kk, vv, scale, 256, 4,
            True).reshape(B, H, L, D), (q0, kf, vf)),
        ("bound", lambda x, kk, vv: flash_attention_v1(
            x, kk, vv, config=cfg_b, causal=True), (q0, kd, vd)),
    ]
    timers = []
    for name, fn, args in paths:
        t0 = time.perf_counter()
        rl, rs = chain(fn, N_LONG), chain(fn, N_SHORT)
        float(rl(*args)); float(rs(*args))
        timers.append((name, rl, rs, args))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)

    results = {name: [] for name, *_ in timers}
    for w in range(WINDOWS):
        for name, rl, rs, args in timers:
            sec = window(rl, rs, *args)
            results[name].append(FLOPS / sec / 1e12)
        print(f"window {w}: " + "  ".join(
            f"{n}={results[n][-1]:5.1f}" for n, *_ in timers), flush=True)

    for name, *_ in timers:
        vals = sorted(results[name])
        print(f"{name:12s}: min {vals[0]:6.1f} med {vals[len(vals)//2]:6.1f} "
              f"max {vals[-1]:6.1f} TF/s (of L^2/2 FLOPs)", flush=True)


if __name__ == "__main__":
    main()
