#!/usr/bin/env python
"""Interleaved A/B: integrated causal one-pass (flash_attention_v1) vs the
proto band+fold kernel it was built from (proto_causal_fast3 r1), plus a
no-cost-estimate variant of the integrated launcher to bisect the gap."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import numpy as np
import jax.numpy as jnp

import exploring_flash_attention_tpu.ops.attention_v1 as av1
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

cfg = TileConfig(block_q=1024, block_kv=1024)
legs = {
    "integrated": lambda x: flash_attention_v1(
        x, kd, vd, config=cfg, causal=True),
    "proto": lambda x: band_causal(
        x.reshape(B * H, L, D), kf, vf, scale, 256, 4, True,
    ).reshape(B, H, L, D),
    "launcher_flat": lambda x: av1._flash_attention_v1_onepass_causal(
        x.reshape(B * H, L, D), kf, vf, scale, jnp.bfloat16, False,
    ).reshape(B, H, L, D),
}

res = {n: [] for n in legs}
for rnd in range(3):
    for name, fn in legs.items():
        sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=4)
        res[name].append(flops / sec / 1e12)
        print(f"round {rnd} {name:14s} {flops/sec/1e12:6.1f} TF", flush=True)
for name, vals in res.items():
    vals = sorted(vals)
    print(f"{name:14s} {['%.1f' % x for x in vals]}", flush=True)
