"""Differentiable flash attention: custom VJP around the Pallas kernels.

The reference has no backward pass (SURVEY: "no training loop ... no
backward pass"), so this is a framework extension: the forward is the
split-KV partial kernel (which already returns the LSE residual the
backward needs), and the backward is the tiled Pallas kernel pair in
ops/attention_bwd.py (fused one-pass when everything fits VMEM, split
dKV/dQ grids otherwise) implementing the standard flash-attention gradient

    P  = exp(q k^T * scale - lse)
    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - rowsum(dO * O)) * scale
    dQ = dS K ;  dK = dS^T Q

with P recomputed tile-wise from (q, k, lse) — the [Lq, Lkv] score matrix
never materializes in HBM.  Supports causal masking at traced global
positions — what sequence-parallel training shards need.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from exploring_flash_attention_tpu.configs import TileConfig


def flash_attention(
    q: jax.Array,               # [B, H, Lq, d]
    k: jax.Array,
    v: jax.Array,
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    positions: Optional[Tuple[jax.Array, jax.Array]] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Differentiable fused attention (Pallas forward, recompute backward).

    ``window``: sliding-window width (causal only, static positions only) —
    both the forward band kernel and the banded backward prune work outside
    the window, so trainable local attention costs O(L*window).

    ``positions=(q_pos0, kv_pos0)``: global positions of row 0 of the q /
    kv shards for causal masking; defaults to the decode convention (q rows
    are the last Lq positions).  Plain-int positions (or the default) are
    baked in at trace time, which lets the forward kernel skip causal MXU
    work statically; traced positions (sequence-parallel shards) take the
    dynamic-masking path."""
    lq, lkv = q.shape[2], k.shape[2]
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window >= lkv:
            window = None          # band covers every key: plain causal
    if positions is None:
        positions = (lkv - lq, 0)
    if all(isinstance(p, (int, np.integer)) for p in positions):
        return _flash_attention_static(
            q, k, v, config, scale, causal, interpret,
            (int(positions[0]), int(positions[1])), window,
        )
    if window is not None:
        raise NotImplementedError(
            "window with traced shard positions is not supported; shard "
            "windows at the caller or use static positions")
    return _flash_attention(
        q, k, v, q_pos0 := jnp.asarray(positions[0], jnp.int32),
        kv_pos0 := jnp.asarray(positions[1], jnp.int32),
        config, scale, causal, interpret
    )


# ---- static-positions variant (positions are compile-time constants) ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_static(
    q, k, v, config, scale, causal, interpret, static_positions, window
):
    out, _ = _fwd_static(
        q, k, v, config, scale, causal, interpret, static_positions, window
    )
    return out


def _fwd_static(q, k, v, config, scale, causal, interpret, static_positions,
                window):
    # local import: parallel.partials itself imports from ops (avoid cycle)
    from exploring_flash_attention_tpu.parallel.partials import (
        attention_partial_local,
    )

    o, lse = attention_partial_local(
        q, k, v, config=config, scale=scale, causal=causal,
        interpret=interpret,
        static_positions=static_positions if causal else None,
        window=window,
    )
    out = o.astype(q.dtype)
    return out, (q, k, v, out, lse)


def _bwd_static(config, scale, causal, interpret, static_positions, window,
                res, g):
    from exploring_flash_attention_tpu.ops.attention_bwd import (
        flash_attention_bwd,
    )

    q, k, v, out, lse = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, g, lse,
        config=config, scale=scale, causal=causal, interpret=interpret,
        static_positions=tuple(int(p) for p in static_positions),
        window=window,
    )
    return dq, dk, dv


_flash_attention_static.defvjp(_fwd_static, _bwd_static)


# ---- traced-positions variant (sequence-parallel shard offsets) ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention(q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret):
    out, _ = _fwd(q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret)
    return out


def _fwd(q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret):
    from exploring_flash_attention_tpu.parallel.partials import (
        attention_partial_local,
    )

    o, lse = attention_partial_local(
        q, k, v, config=config, scale=scale, causal=causal,
        interpret=interpret,
        positions=(q_pos0, kv_pos0) if causal else None,
    )
    out = o.astype(q.dtype)
    return out, (q, k, v, q_pos0, kv_pos0, out, lse)


def _bwd(config, scale, causal, interpret, res, g):
    from exploring_flash_attention_tpu.ops.attention_bwd import (
        flash_attention_bwd,
    )

    q, k, v, q_pos0, kv_pos0, out, lse = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, g, lse,
        config=config, scale=scale, causal=causal, interpret=interpret,
        positions=(q_pos0, kv_pos0),
    )
    zero = np.zeros((), dtype=jax.dtypes.float0)       # int cotangents
    return dq, dk, dv, zero, zero


_flash_attention.defvjp(_fwd, _bwd)
