#!/usr/bin/env python
"""A/B: causal forward at canonical shape.
A = v1 streaming kernel with causal tile-skip (block 512)
B = one-pass partial kernel with lax.cond chunk-skip (vjp fwd path)
C = v1 streaming, block 1024x1024 (no skip possible at this block size)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import SplitKVConfig, TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import (
    flash_attention_splitkv_partial, flash_attention_v1,
)
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
    "A streaming+skip 512": lambda x: flash_attention_v1(
        x, kd, vd, causal=True, config=TileConfig(block_q=512, block_kv=512)),
    "A2 streaming+skip 256k": lambda x: flash_attention_v1(
        x, kd, vd, causal=True, config=TileConfig(block_q=512, block_kv=256)),
    "B onepass-partial": lambda x: flash_attention_splitkv_partial(
        x, kd, vd, causal=True,
        config=SplitKVConfig(block_q=512, block_kv=512, kv_tiles_per_block=2),
    )[0][:, :, 0].astype(x.dtype),
    "C streaming 1024": lambda x: flash_attention_v1(
        x, kd, vd, causal=True,
        config=TileConfig(block_q=1024, block_kv=1024)),
}
for name, fn in variants.items():
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4)
    print(f"{name:26s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TF (causal flops)")
