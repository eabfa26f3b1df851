#!/usr/bin/env python
"""Probe where the headline timing variance comes from (round-4 follow-up to
reconcile_headline.py): sweep the chained-differencing protocol's knobs —
chain length and min-of-k reps — on ONE compiled path.  If variance collapses
as reps grow, it is host/tunnel jitter the protocol can filter (min-of-k);
if it persists at long chains, the chip's execution rate itself fluctuates."""
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
FLOPS = attention_flops(B, H, L, L, D)


def chain(fn, n):
    @jax.jit
    def run(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))
    return run


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    qd = jnp.asarray(q).astype(jnp.bfloat16)
    config = TileConfig(block_q=256, block_kv=1024)

    def step(x, kk, vv):
        return flash_attention_v1(x, kk, vv, config=config)

    variants = [(24, 4), (48, 4), (96, 4)]
    runs = {}
    for nl, ns in variants:
        rl, rs = chain(step, nl), chain(step, ns)
        float(rl(qd, kd, vd)); float(rs(qd, kd, vd))
        runs[(nl, ns)] = (rl, rs)

    # 12 windows per variant, interleaved; record ALL raw reps so we can
    # compute min-of-k for any k<=4 offline
    raw = {key: [] for key in variants}
    for w in range(12):
        for key in variants:
            rl, rs = runs[key]
            nl, ns = key
            shorts, longs = [], []
            for _ in range(4):
                t0 = time.perf_counter(); float(rs(qd, kd, vd))
                shorts.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(rl(qd, kd, vd))
                longs.append(time.perf_counter() - t0)
            raw[key].append((shorts, longs))
        print(f"window {w} done", flush=True)

    for key in variants:
        nl, ns = key
        for kmin in (1, 2, 4):
            tfs = []
            for shorts, longs in raw[key]:
                sec = (min(longs[:kmin]) - min(shorts[:kmin])) / (nl - ns)
                tfs.append(FLOPS / sec / 1e12)
            tfs = sorted(tfs)
            n = len(tfs)
            print(f"chain {nl:3d}/{ns} min-of-{kmin}: "
                  f"min {tfs[0]:6.1f} p25 {tfs[n//4]:6.1f} "
                  f"med {tfs[n//2]:6.1f} p75 {tfs[3*n//4]:6.1f} "
                  f"max {tfs[-1]:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
