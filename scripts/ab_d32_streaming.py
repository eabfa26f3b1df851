"""In-process A/B: d=32 one-pass q_chunk sweep + streaming block_q sweep."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)


def bf16(b, h, l, d, seed):
    q, k, v = make_qkv(b, h, l, d, dtype=np.float32, seed=seed)
    return tuple(jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))


def run(tag, fn, q, flops):
    sec = time_fn_chained(fn, q)
    print(f"{tag:45s} {sec*1e3:8.3f} ms  {flops/sec/1e12:7.1f} TF",
          flush=True)


def main():
    # ---- d=32 one-pass q_chunk sweep ----
    b, h, l, d = 32, 8, 1024, 32
    qb, kb, vb = bf16(b, h, l, d, seed=1)
    fl = attention_flops(b, h, l, l, d)
    for qc in (128, 256, 512, 1024):
        cfg = TileConfig(block_q=1024, block_kv=1024, q_chunk=qc)
        run(f"d32 one-pass q_chunk={qc}",
            lambda x, c=cfg: flash_attention_v1(x, kb, vb, config=c), qb, fl)

    # ---- streaming (online-softmax) block sweep at d=128 ----
    b, h, l, d = 32, 8, 1024, 128
    qb, kb, vb = bf16(b, h, l, d, seed=1)
    fl = attention_flops(b, h, l, l, d)
    for bq in (256, 512, 1024):
        cfg = TileConfig(block_q=bq, block_kv=512, one_pass=False)
        run(f"streaming bq={bq} bkv=512",
            lambda x, c=cfg: flash_attention_v1(x, kb, vb, config=c), qb, fl)


if __name__ == "__main__":
    main()
