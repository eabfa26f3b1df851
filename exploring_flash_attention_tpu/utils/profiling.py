"""Profiling / tracing harness.

The reference's observability is wall-clock printf timing around the
launcher (driver.cu:218-243).  The TPU-native equivalents here:

- :func:`trace`: context manager around ``jax.profiler`` — writes an XPlane
  trace viewable in TensorBoard / Perfetto (per-kernel device timeline, the
  role nvprof/NSight would play for the reference);
- :func:`kernel_report`: wall-clock per-kernel timing + TFLOP/s vs the
  roofline model, printed as the reference drivers print their tables.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.utils.benchmark import (
    V5E_HBM_GBPS,
    V5E_PEAK_BF16_TFLOPS,
    time_fn_chained,
)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/efa_trace"):
    """Capture a device trace: ``with trace("/tmp/t"): run()`` then open the
    directory in TensorBoard (Profile tab) or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def roofline_tflops(
    flops: int,
    bytes_moved: int,
    peak_tflops: float = V5E_PEAK_BF16_TFLOPS,
    hbm_gbps: float = V5E_HBM_GBPS,
) -> float:
    """Attainable TFLOP/s = min(compute peak, intensity * bandwidth)."""
    intensity = flops / max(bytes_moved, 1)
    return min(peak_tflops, intensity * hbm_gbps / 1e3)


def kernel_report(
    entries: Iterable[Tuple[str, Callable[[jax.Array], jax.Array], jax.Array,
                            int, int]],
    file=None,
) -> Dict[str, Dict[str, float]]:
    """Time kernels and print a TFLOP/s-vs-roofline table.

    ``entries``: (name, fn, x0, flops_per_call, bytes_per_call).  Returns
    {name: {ms, tflops, roofline_pct}}."""
    results: Dict[str, Dict[str, float]] = {}
    print(f"{'kernel':<32} {'ms':>9} {'TFLOP/s':>9} {'roofline%':>10}",
          file=file)
    for name, fn, x0, flops, nbytes in entries:
        sec = time_fn_chained(fn, x0)
        tf = flops / sec / 1e12
        roof = roofline_tflops(flops, nbytes)
        results[name] = {
            "ms": sec * 1e3,
            "tflops": tf,
            "roofline_pct": 100.0 * tf / roof,
        }
        print(f"{name:<32} {sec*1e3:>9.3f} {tf:>9.1f} "
              f"{100.0*tf/roof:>9.1f}%", file=file)
    return results
