#!/usr/bin/env python
"""Reconcile bench.py's driver timing path with proto_onepass9's in-process
path (VERDICT r2 item 1): compile each path ONCE, then interleave timed
windows.  If the 3-8% driver-vs-proto gap is real it shows here; if it is
tunnel-window variance the interleaved readings straddle."""
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


def proto_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc):
    bq = q_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, bq, qc):
        q = q_ref[0, q0:q0 + qc, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True) * c
        pb = jnp.exp2(s * c - m).astype(v.dtype)
        pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, q0:q0 + qc, :] = (pv / denom).astype(o_ref.dtype)


def make_proto_call(qc=256):
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    return pl.pallas_call(
        functools.partial(proto_kernel, c=c, qc=qc),
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


def make_timers(fn):
    """(run_long, run_short) jits for x -> fn(x, *rest) chained.  K/V
    ride as REAL jit arguments, never closed over: a closed-over array
    becomes an HLO constant in the remote-compile request, and 128 MB of
    constants is over the tunnel's request limit (utils/benchmark.py)."""
    def chain(n):
        @jax.jit
        def run(x, *rest):
            def body(c, _):
                return fn(c, *rest), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return run
    return chain(N_LONG), chain(N_SHORT)


def window(run_long, run_short, x, *rest):
    """One timing window: min-of-2 long/short difference."""
    shorts, longs = [], []
    for _ in range(2):
        t0 = time.perf_counter(); float(run_short(x, *rest))
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run_long(x, *rest))
        longs.append(time.perf_counter() - t0)
    return (min(longs) - min(shorts)) / (N_LONG - N_SHORT)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    k_dev = jnp.asarray(k).astype(jnp.bfloat16)
    v_dev = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    config = TileConfig(block_q=1024, block_kv=1024)

    def driver_step(x, kk, vv):
        return flash_attention_v1(x, kk, vv, config=config)

    qf = q0.reshape(B * H, L, D)
    kf = (jnp.asarray(k) * 0.05).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf_raw = k_dev.reshape(B * H, L, D)
    vf = v_dev.reshape(B * H, L, D)
    proto = make_proto_call()

    paths = [
        ("driver", make_timers(driver_step), (q0, k_dev, v_dev)),
        ("proto", make_timers(proto), (qf, kf, vf)),
        ("proto_rawK", make_timers(proto), (qf, kf_raw, vf)),
    ]
    # compile + warm everything first
    for name, (rl, rs), args in paths:
        t0 = time.perf_counter()
        float(rl(*args)); float(rs(*args))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {name: [] for name, _, _ in paths}
    for rep in range(6):
        for name, (rl, rs), args in paths:
            sec = window(rl, rs, *args)
            tf = FLOPS / sec / 1e12
            results[name].append(tf)
            print(f"rep{rep} {name:11s}: {sec*1e3:7.3f} ms {tf:6.1f} TF/s "
                  f"({100*tf/ROOF:4.1f}%)", flush=True)
    print()
    for name, vals in results.items():
        vals = sorted(vals)
        print(f"{name:11s}: min {vals[0]:6.1f}  med {vals[len(vals)//2]:6.1f}"
              f"  max {vals[-1]:6.1f} TF/s")


if __name__ == "__main__":
    main()
