#!/usr/bin/env python
"""Within-process 3-way causal fwd comparison, reps=5."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import exploring_flash_attention_tpu.ops.attention_v2_splitkv as sk
from exploring_flash_attention_tpu.configs import SplitKVConfig, TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.parallel.partials import attention_partial_local
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
kd = jnp.asarray(k).astype(jnp.bfloat16)
vd = jnp.asarray(v).astype(jnp.bfloat16)
q0 = jnp.asarray(q).astype(jnp.bfloat16)
flops = attention_flops(B, H, L, L, D, causal=True)

def run(name, fn):
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=5)
    print(f"{name:34s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TF")

# (a) one-pass partial with static skip (current routing)
run("a onepass-partial static-skip", lambda x: attention_partial_local(
    x, kd, vd, causal=True, static_positions=(0, 0),
    config=TileConfig(block_q=1024, block_kv=1024))[0].astype(jnp.bfloat16))

# (b) splitkv streaming, single whole-KV tile (bypass one-pass routing)
_orig = sk.fits_onepass
sk.fits_onepass = lambda *a: False
run("b splitkv streaming 1-tile", lambda x: sk.flash_attention_splitkv_partial(
    x, kd, vd, causal=True, static_positions=(0, 0),
    config=SplitKVConfig(block_q=1024, block_kv=1024, kv_tiles_per_block=1),
)[0][:, :, 0].astype(jnp.bfloat16))
sk.fits_onepass = _orig

# (c) v1 streaming full-block causal (no lse output)
run("c v1 streaming 1024 causal", lambda x: flash_attention_v1(
    x, kd, vd, causal=True, config=TileConfig(block_q=1024, block_kv=1024)))

# (d) non-causal one-pass for scale
fl2 = attention_flops(B, H, L, L, D)
def run2(name, fn):
    sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=5)
    print(f"{name:34s} {sec*1e3:7.3f} ms  {fl2/sec/1e12:6.1f} TF (full flops)")
run2("d v1 one-pass non-causal", lambda x: flash_attention_v1(
    x, kd, vd, config=TileConfig(block_q=1024, block_kv=1024)))
