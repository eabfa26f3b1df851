"""In-process A/B: bf16 one-pass vs int8-QKV at prefill lengths 1K-4K."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_int8 import (
    flash_attention_int8,
)
from exploring_flash_attention_tpu.ops.quant import quantize_int8
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

for l in (1024, 2048, 4096):
    b, h, d = 8, 8, 128
    q, k, v = make_qkv(b, h, l, d, dtype=np.float32, seed=1)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    fl = attention_flops(b, h, l, l, d)

    cfg = TileConfig(block_q=512, block_kv=512)
    sec = time_fn_chained(
        lambda x: flash_attention_v1(x, kb, vb, config=cfg), qb)
    print(f"L={l:5d} bf16 one-pass   {sec*1e3:8.3f} ms  "
          f"{fl/sec/1e12:7.1f} TF", flush=True)

    kq, vq = quantize_int8(kb, block=512), quantize_int8(vb, block=512)

    def step(x, kq=kq, vq=vq):
        xq = quantize_int8(x, block=512)
        return flash_attention_int8(xq, kq, vq, config=cfg)

    sec = time_fn_chained(step, qb)
    print(f"L={l:5d} int8 QKV        {sec*1e3:8.3f} ms  "
          f"{fl/sec/1e12:7.1f} TF (incl per-step Q quant)", flush=True)
