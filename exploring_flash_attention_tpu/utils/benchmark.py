"""Benchmark harness — the role of the reference's driver.cu timing loops
(flash_attention_v1/CUDA/driver.cu:218-243: warmup + timed runs around the
launcher), built for an environment where host<->device round-trips are
expensive and ``block_until_ready`` cannot be trusted (axon tunnel).

Technique: chain N kernel invocations inside ONE jitted computation with a
data dependency between iterations (lax.scan feeding the output back as the
query), then force completion by pulling a scalar to host.  Timing two chain
lengths and differencing removes the constant dispatch/transfer overhead —
the per-iteration delta is pure device time.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_fn_chained(
    fn: Callable[..., jax.Array],
    x0: jax.Array,
    *extra: jax.Array,
    n_long: int = 24,
    n_short: int = 4,
    reps: int = 4,
) -> float:
    """Per-iteration seconds of ``x -> fn(x, *extra)`` chained on-device.

    ``fn`` must map an array to an array of the same shape/dtype (attention
    with q := output does).  The scan carry creates the data dependency that
    prevents XLA from parallelizing or eliminating iterations.

    Large operands (K/V at long context) must ride in ``extra``, not be
    closed over: a closed-over jax array becomes an HLO *constant* embedded
    in the compile request, which the remote-compile tunnel rejects past
    ~100 MB (HTTP 413).  ``extra`` arrays are real jit arguments.

    Each chain length is timed ``reps`` times and the MINIMUM is used
    before differencing: tunnel pauses only ever inflate a measurement,
    and a pause landing in a *short* run makes the paired difference
    under-estimate the per-iteration time (observed as a >100%-of-roofline
    reading).  min(long) - min(short) is robust to one-sided noise.
    """

    return time_fn_chained_windows(
        fn, x0, *extra, n_long=n_long, n_short=n_short, reps=reps,
        windows=1,
    )[0]


def time_fn_chained_windows(
    fn: Callable[..., jax.Array],
    x0: jax.Array,
    *extra: jax.Array,
    n_long: int = 24,
    n_short: int = 4,
    reps: int = 4,
    windows: int = 1,
    target_long_sec: float = 0.2,
    n_long_cap: int = 192,
) -> list:
    """``windows`` independent :func:`time_fn_chained` measurements that
    share ONE compilation of each chain.

    The long chain is AUTO-CALIBRATED: after warming the short chain, its
    wall time estimates the per-iteration cost and ``n_long`` is raised
    (never lowered below the caller's value) so one long call spans
    ``target_long_sec``.  Rationale (scripts/probe_timing_variance.py,
    round 4): tunnel RTT jitter is a few ms one-sided; against a 22 ms
    long call (the old fixed n_long=24 at the headline shape) it produced
    a 127-183 TF/s spread that min-of-k could not filter, biasing the
    median LOW (the r01->r03 headline "decline" was this, not the kernel
    — reconciliation in docs/headline_bound.md).  Against a ~200 ms call
    the same jitter is <2% and the distribution collapses (148-153 TF/s
    at chain 96).  Fast kernels get long chains; already-slow callers
    (suite entries passing n_long=6..12) keep theirs."""

    def chain(n):
        @jax.jit
        def run(x, *rest):
            def body(c, _):
                return fn(c, *rest), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return run

    def timed(run):
        t0 = time.perf_counter()
        float(run(x0, *extra))
        return time.perf_counter() - t0

    run_short = chain(n_short)
    float(run_short(x0, *extra))            # compile + warm
    t_short = min(timed(run_short) for _ in range(2))
    per_iter_est = t_short / n_short        # >= true per-iter (has overhead)
    if per_iter_est > 0:
        n_long = max(n_long,
                     min(n_long_cap,
                         max(2 * n_short, int(target_long_sec / per_iter_est))))
    run_long = chain(n_long)
    float(run_long(x0, *extra))             # compile + warm

    # second calibration pass for dispatch-dominated kernels: when the
    # per-call overhead (~25-30 ms through the tunnel) dwarfs the kernel,
    # the first estimate is off by the overhead/work ratio (observed 50x
    # on the ~0.12 ms extend step, where differencing two nearly-constant
    # calls went NEGATIVE).  Refine per-iter by differencing and stretch
    # the chain so the differenced device time itself spans the target.
    # Bounded refinement: a non-positive difference means the chain is
    # still fully dispatch-dominated and carries no per-iter signal, so
    # grow geometrically (4x) and RE-measure rather than jumping straight
    # to a 4096-call unrolled chain (round-4 ADVICE).  Requires
    # n_long > n_short — equal chain lengths cannot be differenced.
    for _ in range(4):
        if n_long <= n_short or n_long >= 4096:
            break
        t_long = min(timed(run_long) for _ in range(2))
        diff = t_long - t_short
        if diff >= 0.5 * target_long_sec:
            break
        if diff > 0:
            per_iter = diff / (n_long - n_short)
            n_better = min(4096, max(n_long * 2,
                                     int(target_long_sec / per_iter)))
        else:
            n_better = min(4096, n_long * 4)
        if n_better <= n_long:
            break
        n_long = n_better
        run_long = chain(n_long)
        float(run_long(x0, *extra))         # compile + warm

    out = []
    for _ in range(windows):
        shorts, longs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_short(x0, *extra))
            shorts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run_long(x0, *extra))
            longs.append(time.perf_counter() - t0)
        out.append((min(longs) - min(shorts)) / (n_long - n_short))
    return out


def attention_flops(b: int, h: int, lq: int, lkv: int, d: int, causal: bool = False) -> int:
    """Forward attention FLOPs: 2 matmuls of 2*L*L*d each per (b, h)."""
    f = 4 * b * h * lq * lkv * d
    return f // 2 if causal else f


# TPU v5e (v5 lite) per-chip peak numbers, public spec.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_INT8_TOPS = 394.0
V5E_HBM_GBPS = 819.0


def roofline_attention_tflops(
    b: int, h: int, l: int, d: int,
    dtype_bytes: int = 2,
    peak_tflops: float = V5E_PEAK_BF16_TFLOPS,
    hbm_gbps: float = V5E_HBM_GBPS,
) -> float:
    """Attainable TFLOP/s for the fwd attention kernel on one chip.

    min(MXU peak, HBM-bandwidth bound): bytes moved are Q, K, V, O once
    each (flash attention's whole point — no L^2 traffic)."""
    flops = attention_flops(b, h, l, l, d)
    bytes_moved = 4 * b * h * l * d * dtype_bytes
    intensity = flops / bytes_moved                     # flops per byte
    bw_bound = intensity * hbm_gbps / 1e3               # TFLOP/s
    return min(peak_tflops, bw_bound)
