#!/usr/bin/env python
"""Headline benchmark: fused attention forward TFLOP/s on one chip at the
reference's canonical d=128 shape (B=32, H=8, L=1024 — the shape of every
reference driver, flash_attention_v1/CUDA/driver.cu:140-143 with d=128 as in
the tiled_d/V2 drivers).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is speedup over the reference's best number at this shape —
39 ms for the d-tiled V1 WMMA kernel on an Ampere GPU (BASELINE.md).

Discipline (VERDICT r2 items 1, 8, 9):
- the tile config is AUTOTUNE-selected (utils/autotune.py), with the
  winner persisted to bench/autotune_cache.json so the tuner the repo
  ships is the tuner this number uses;
- the accuracy gate runs the EXACT timed code path — same shape, same
  config — and referees a (b, h) slice of it against the f64 oracle
  (max|delta| <= 1e-3 on bf16-rounded inputs);
- the value is the MEDIAN of N independent timing windows sharing one
  compilation, and the min/median/max distribution is printed alongside
  (tunnel readings for one binary vary across windows —
  docs/headline_bound.md).
"""

import json
import os
import sys

import numpy as np

REFERENCE_BEST_MS = 39.0          # tiled_d + WMMA, BASELINE.md (d=128 shape)
B, H, L, D = 32, 8, 1024, 128
GATE_BH = 2                       # (b, h) prefix refereed by the f64 oracle
WINDOWS = 7

# the autotune winner lands next to the suite results so the selected
# config is a checked-in, reviewable artifact
os.environ.setdefault(
    "EFA_AUTOTUNE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench", "autotune_cache.json"),
)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.oracle.reference import (
        error_stats, make_qkv, naive_attention,
    )
    from exploring_flash_attention_tpu.ops import flash_attention_v1
    from exploring_flash_attention_tpu.utils.autotune import autotune_v1
    from exploring_flash_attention_tpu.utils.benchmark import (
        attention_flops, roofline_attention_tflops, time_fn_chained_windows,
    )

    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    k_dev = jnp.asarray(k).astype(jnp.bfloat16)
    v_dev = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)

    config = autotune_v1(q0, k_dev, v_dev)

    # ---- accuracy gate: the exact timed path (shape + config), a
    # (b, h) slice refereed against the f64 oracle ----
    out = np.asarray(
        flash_attention_v1(q0, k_dev, v_dev, config=config,
                           out_dtype=jnp.float32)[:GATE_BH, :GATE_BH]
    )
    ref = naive_attention(
        *(np.asarray(x[:GATE_BH, :GATE_BH].astype(jnp.float32))
          for x in (q0, k_dev, v_dev))
    )
    max_abs = error_stats(out, ref)["max_abs"]
    if max_abs > 1e-3:
        print(json.dumps({
            "metric": "attention_fwd_accuracy_FAILED",
            "value": max_abs, "unit": "max_abs_err", "vs_baseline": 0.0,
        }))
        return 1

    # ---- timing at the canonical shape: N windows, one compilation.
    # K/V ride as real jit arguments (not closed-over HLO constants —
    # the remote-compile tunnel limit, utils/benchmark.py docstring) ----
    def step(x, kk, vv):
        return flash_attention_v1(x, kk, vv, config=config)

    secs = sorted(
        time_fn_chained_windows(step, q0, k_dev, v_dev, windows=WINDOWS))
    sec = secs[len(secs) // 2]                      # median window
    flops = attention_flops(B, H, L, L, D)
    to_tf = lambda s: flops / s / 1e12              # noqa: E731
    tflops = to_tf(sec)
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
        f"windows (TF/s) min {to_tf(secs[-1]):.1f} / med {tflops:.1f} / "
        f"max {to_tf(secs[0]):.1f} over {WINDOWS} | "
        f"config bq={config.block_q} bkv={config.block_kv} | "
        f"accuracy gate max_abs {max_abs:.2e} on [{GATE_BH},{GATE_BH}] slice",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
