#!/usr/bin/env python
"""A/B round 2: causal fwd via the static-skip one-pass partial."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention, flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128

q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
flops = attention_flops(B, H, L, L, D, causal=True)

variants = {
    "vjp-fwd static-skip": lambda x: flash_attention(x, kd, vd, causal=True),
    "v1 streaming 1024 (ref)": lambda x: flash_attention_v1(
        x, kd, vd, causal=True,
        config=TileConfig(block_q=1024, block_kv=1024)),
    "train fwd+bwd": None,
}
for name, fn in variants.items():
    if fn is None:
        def fn(x):
            dq, dk, dv = jax.grad(
                lambda a, b, c: jnp.sum(flash_attention(a, b, c, causal=True)),
                argnums=(0, 1, 2))(x, kd, vd)
            return ((dq + dk + dv) / 3).astype(x.dtype)
        sec = time_fn_chained(fn, q0, n_long=12, n_short=3)
        tf = 4.5 * flops / sec / 1e12
        print(f"{name:26s} {sec*1e3:7.3f} ms  {tf:6.1f} TF")
        continue
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4)
    print(f"{name:26s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TF (causal flops)")
