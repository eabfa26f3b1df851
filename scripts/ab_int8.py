#!/usr/bin/env python
"""Reproducibility check: int8-QK hybrid vs bf16 one-pass, reps=5, twice."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_int8 import flash_attention_int8
from exploring_flash_attention_tpu.ops.quant import quantize_int8
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
flops = attention_flops(B, H, L, L, D)
cfg = TileConfig(block_q=512, block_kv=512)
kq, vq = quantize_int8(kd, block=512), quantize_int8(vd, block=512)

def hybrid(x):
    return flash_attention_int8(quantize_int8(x, block=512), kq, vq, config=cfg)

def hybrid_noquant(x):
    # time the kernel alone: reuse a fixed pre-quantized Q, chain via output add
    out = flash_attention_int8(qq_fixed, kq, vq, config=cfg)
    return out + 0.0 * x[..., :1, :1].astype(out.dtype)  # keep dependency tiny

qq_fixed = quantize_int8(q0, block=512)

def bf16(x):
    return flash_attention_v1(x, kd, vd, config=TileConfig(block_q=1024, block_kv=1024))

for rnd in (1, 2):
    for name, fn in [("bf16 one-pass", bf16), ("int8qk hybrid(+quant)", hybrid)]:
        sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=5)
        print(f"r{rnd} {name:22s} {sec*1e3:7.3f} ms {flops/sec/1e12:7.1f} TF")
