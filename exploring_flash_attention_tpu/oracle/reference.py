"""Numerics oracle + accuracy harness.

The leaf of the validation stack (reference L0, common/reference.py:7-96):
every simulator, Pallas kernel, quantized path, and multi-chip combine in this
repo validates against ``naive_attention``.  Unlike the reference's
single-head [L, d] oracle, this one is batched over arbitrary leading dims —
[B, H, L, d] is the canonical layout everywhere in this repo.

Tolerance tiers intentionally match the reference harness
(common/reference.py:24: max_abs 1e-2, filtered max_rel 0.5 with mask
|ref| > 1e-3, mean_rel 0.05), so pass/fail is directly comparable.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def naive_attention(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    window: Optional[int] = None,
) -> np.ndarray:
    """Materialized-scores attention oracle in float64 NumPy.

    O = softmax(Q K^T * scale) V with a numerically stable (max-subtracted)
    softmax, computed on [..., L, d] inputs.  Mirrors the role of the
    reference's common/reference.py:7-21 ``naive_attention`` but batched and
    always in f64 internally so it can referee low-precision kernels.
    """
    q64 = np.asarray(q, dtype=np.float64)
    k64 = np.asarray(k, dtype=np.float64)
    v64 = np.asarray(v, dtype=np.float64)
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    scores = np.einsum("...qd,...kd->...qk", q64, k64) * scale
    if causal:
        lq, lk = scores.shape[-2], scores.shape[-1]
        mask = np.tril(np.ones((lq, lk), dtype=bool), k=lk - lq)
        if window is not None:
            # sliding window: each row attends to its last `window`
            # positions (inclusive of itself)
            mask &= ~np.tril(
                np.ones((lq, lk), dtype=bool), k=lk - lq - window
            )
        scores = np.where(mask, scores, -np.inf)
    scores -= scores.max(axis=-1, keepdims=True)
    weights = np.exp(scores)
    weights /= weights.sum(axis=-1, keepdims=True)
    return np.einsum("...qk,...kd->...qd", weights, v64)


def naive_attention_jax(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    causal: bool = False,
) -> jax.Array:
    """jnp twin of :func:`naive_attention` — f32 stable softmax, jit-friendly.

    Used as the on-device XLA baseline the Pallas kernels race against, and
    as the reference path inside multi-chip tests.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    if causal:
        lq, lk = scores.shape[-2], scores.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        scores = jnp.where(col <= row + (lk - lq), scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "...qk,...kd->...qd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q.dtype)


class AccuracyError(AssertionError):
    """Raised when an implementation drifts beyond tolerance vs the oracle."""


def error_stats(out, ref, rel_floor: float = 1e-3) -> dict:
    """max-abs / filtered max-rel / mean-rel error triple.

    Same metric definitions as the reference harness
    (common/reference.py:24-78): relative error is only measured where
    |ref| > rel_floor to avoid division blow-ups near zero.
    """
    out64 = np.asarray(out, dtype=np.float64)
    ref64 = np.asarray(ref, dtype=np.float64)
    if out64.shape != ref64.shape:
        raise ValueError(f"shape mismatch: {out64.shape} vs {ref64.shape}")
    abs_err = np.abs(out64 - ref64)
    max_abs = float(abs_err.max()) if abs_err.size else 0.0
    mask = np.abs(ref64) > rel_floor
    if mask.any():
        rel = abs_err[mask] / np.abs(ref64[mask])
        max_rel, mean_rel = float(rel.max()), float(rel.mean())
    else:
        max_rel = mean_rel = 0.0
    worst = np.unravel_index(int(abs_err.argmax()), abs_err.shape) if abs_err.size else ()
    return {
        "max_abs": max_abs,
        "max_rel": max_rel,
        "mean_rel": mean_rel,
        "worst_index": worst,
        "worst_out": float(out64[worst]) if abs_err.size else 0.0,
        "worst_ref": float(ref64[worst]) if abs_err.size else 0.0,
    }


def check_accuracy(
    out,
    ref,
    name: str = "impl",
    max_abs_tol: float = 1e-2,
    max_rel_tol: float = 0.5,
    mean_rel_tol: float = 0.05,
    rel_floor: float = 1e-3,
    verbose: bool = False,
) -> dict:
    """Raise :class:`AccuracyError` if ``out`` drifts beyond tolerance of ``ref``.

    Default tolerances are the reference's (common/reference.py:24).  Returns
    the error-stat dict on success so callers can log it.
    """
    stats = error_stats(out, ref, rel_floor=rel_floor)
    if verbose:
        print_comparison(out, ref, name=name, rel_floor=rel_floor)
    failures = []
    if stats["max_abs"] > max_abs_tol:
        failures.append(f"max_abs {stats['max_abs']:.3e} > {max_abs_tol:.1e}")
    if stats["max_rel"] > max_rel_tol:
        failures.append(f"max_rel {stats['max_rel']:.3e} > {max_rel_tol:.1e}")
    if stats["mean_rel"] > mean_rel_tol:
        failures.append(f"mean_rel {stats['mean_rel']:.3e} > {mean_rel_tol:.1e}")
    if failures:
        raise AccuracyError(
            f"{name}: accuracy check failed: " + "; ".join(failures)
            + f" (worst at {stats['worst_index']}: out={stats['worst_out']:.6f}"
            f" ref={stats['worst_ref']:.6f})"
        )
    return stats


def print_comparison(out, ref, name: str = "impl", rel_floor: float = 1e-3) -> None:
    """Human-readable error report (role of common/reference.py:81-96)."""
    stats = error_stats(out, ref, rel_floor=rel_floor)
    print(f"--- {name} vs oracle ---")
    print(f"  max abs err : {stats['max_abs']:.6e}")
    print(f"  max rel err : {stats['max_rel']:.6e}  (|ref| > {rel_floor:g})")
    print(f"  mean rel err: {stats['mean_rel']:.6e}")
    print(
        f"  worst @ {stats['worst_index']}: out={stats['worst_out']:.6f} "
        f"ref={stats['worst_ref']:.6f}"
    )


def make_qkv(
    batch: int,
    heads: int,
    seq_len: int,
    head_dim: int,
    dtype=np.float32,
    seed: int = 0,
    seq_len_kv: Optional[int] = None,
):
    """Seeded random QKV in the repo-wide [B, H, L, d] layout.

    Standard-normal init like the Python self-tests (numpy_basic.py:110-113);
    the CUDA drivers use uniform [-1, 1] instead — normal is the harsher test
    for softmax overflow, so it is the default here.
    """
    rng = np.random.default_rng(seed)
    lkv = seq_len if seq_len_kv is None else seq_len_kv
    q = rng.standard_normal((batch, heads, seq_len, head_dim)).astype(dtype)
    k = rng.standard_normal((batch, heads, lkv, head_dim)).astype(dtype)
    v = rng.standard_normal((batch, heads, lkv, head_dim)).astype(dtype)
    return q, k, v
