#!/usr/bin/env python
"""Interleaved A/B: shipped causal one-pass vs band+fold4+heads-inner.

Alternating timing windows in one process cancel tunnel drift — the
reconcile_headline.py discipline.  Each window is one chained-differencing
measurement (min(long)-min(short), reps=4)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
scale = 1.0 / math.sqrt(D)
flops = attention_flops(B, H, L, L, D, causal=True)
kf = kd.reshape(B * H, L, D)
vf = vd.reshape(B * H, L, D)

import importlib.util
_spec = importlib.util.spec_from_file_location(
    "pc3", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "proto_causal_fast3.py"))
_src = open(_spec.origin).read()
_src = _src[:_src.index('B, H, L, D = ')]
_ns = {"__file__": _spec.origin}
exec(compile(_src, _spec.origin, "exec"), _ns)
band_causal = _ns["band_causal"]

fn_a = lambda x: flash_attention_v1(                       # noqa: E731
    x, kd, vd, causal=True, config=TileConfig(block_q=1024, block_kv=1024))
fn_b = lambda x: band_causal(                              # noqa: E731
    x.reshape(B * H, L, D), kf, vf, scale, 256, 4, True).reshape(B, H, L, D)

# compile both once
fn_a(q0).block_until_ready()
fn_b(q0).block_until_ready()

res = {"shipped": [], "band_fold_hi": []}
for rnd in range(4):
    for name, fn in (("shipped", fn_a), ("band_fold_hi", fn_b)):
        sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=4)
        res[name].append(flops / sec / 1e12)
        print(f"round {rnd} {name:14s} {flops/sec/1e12:6.1f} TF", flush=True)

for name, vals in res.items():
    vals = sorted(vals)
    print(f"{name:14s} min {vals[0]:6.1f} med "
          f"{vals[len(vals)//2]:6.1f} max {vals[-1]:6.1f} TF", flush=True)
