#!/usr/bin/env python
"""Headline benchmark: fused attention forward TFLOP/s on one chip at the
reference's canonical d=128 shape (B=32, H=8, L=1024 — the shape of every
reference driver, flash_attention_v1/CUDA/driver.cu:140-143 with d=128 as in
the tiled_d/V2 drivers).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is speedup over the reference's best number at this shape —
39 ms for the d-tiled V1 WMMA kernel on an Ampere GPU (BASELINE.md).
Accuracy is gated (max|delta| <= 1e-3 vs the f64 oracle on bf16-rounded
inputs) before the timing is reported; a FAILED line is printed instead if
the gate trips.
"""

import json
import sys

import numpy as np

REFERENCE_BEST_MS = 39.0          # tiled_d + WMMA, BASELINE.md (d=128 shape)
B, H, L, D = 32, 8, 1024, 128


def main() -> int:
    import jax
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.oracle.reference import (
        error_stats, make_qkv, naive_attention,
    )
    from exploring_flash_attention_tpu.ops import flash_attention_v1
    from exploring_flash_attention_tpu.utils.benchmark import (
        attention_flops, roofline_attention_tflops, time_fn_chained,
    )

    config = TileConfig(block_q=1024, block_kv=1024)

    # ---- accuracy gate (small shape so the f64 oracle stays cheap) ----
    q, k, v = make_qkv(2, 4, 512, D, dtype=np.float32, seed=0)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    gate_cfg = TileConfig(block_q=512, block_kv=512)
    out = np.asarray(
        flash_attention_v1(qb, kb, vb, config=gate_cfg, out_dtype=jnp.float32)
    )
    ref = naive_attention(
        *(np.asarray(x.astype(jnp.float32)) for x in (qb, kb, vb))
    )
    max_abs = error_stats(out, ref)["max_abs"]
    if max_abs > 1e-3:
        print(json.dumps({
            "metric": "attention_fwd_accuracy_FAILED",
            "value": max_abs, "unit": "max_abs_err", "vs_baseline": 0.0,
        }))
        return 1

    # ---- timing at the canonical shape ----
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    k_dev = jnp.asarray(k).astype(jnp.bfloat16)
    v_dev = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)

    def step(x):
        return flash_attention_v1(x, k_dev, v_dev, config=config)

    sec = time_fn_chained(step, q0)
    flops = attention_flops(B, H, L, L, D)
    tflops = flops / sec / 1e12
    roof = roofline_attention_tflops(B, H, L, D)

    print(json.dumps({
        "metric": "attention_fwd_tflops_per_chip",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(REFERENCE_BEST_MS / (sec * 1e3), 2),
    }))
    print(
        f"# {sec*1e3:.3f} ms at B={B},H={H},L={L},d={D} bf16 | "
        f"roofline {roof:.1f} TFLOP/s -> {100*tflops/roof:.1f}% | "
        f"accuracy gate max_abs {max_abs:.2e}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
