"""Partial-attention primitives shared by every cross-chip strategy.

The V2 workspace triple (normalized O, lse) is exactly what a chip exchanges
in ring / cross-host split-KV attention (SURVEY §2.6: "the combine rule ...
is applied either via a ring ... or via an all-gather of the partial
triple").  This module provides:

- :func:`attention_partial_local`: one chip's partial over its local KV
  shard (the split-KV forward kernel with a single KV block);
- :func:`merge_partials`: the associative pairwise LSE merge used to fold
  streamed partials together (ring steps, tree combines).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import SplitKVConfig, TileConfig, cdiv
from exploring_flash_attention_tpu.ops.attention_v2_splitkv import (
    flash_attention_splitkv_partial,
)


def attention_partial_local(
    q: jax.Array,               # [B, H, Lq, d]
    k: jax.Array,               # [B, H, Lkv_local, d]
    v: jax.Array,
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    causal: bool = False,
    positions: Optional[Tuple[jax.Array, jax.Array]] = None,
    static_positions: Optional[Tuple[int, int]] = None,
    window: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Normalized partial attention over a local KV shard.

    Returns (o_partial [B,H,Lq,d] f32, lse [B,H,Lq] f32).  For causal
    shards at traced global offsets, pass ``positions=(q_pos0, kv_pos0)``;
    offsets known at trace time go in ``static_positions`` instead (enables
    trace-time causal FLOP skipping)."""
    lkv = k.shape[2]
    if window is not None and (not causal or positions is not None):
        raise NotImplementedError(
            "window requires causal=True with static positions")
    # Causal with static offsets over a VMEM-resident KV: the causal
    # one-pass kernel truncates QK^T, softmax AND PV per strip (the
    # split-KV partial below only skips QK^T chunks) — measured ~2x at
    # L=1024 (scripts/ab_causal_onepass.py).  Traced offsets (ring shards)
    # keep the dynamic-masking split-KV path.
    if causal and positions is None:
        from exploring_flash_attention_tpu.ops.attention_v1 import (
            causal_partial_onepass_eligible,
            flash_attention_v1_causal_partial,
            flash_attention_v1_window_partial,
            window_onepass_eligible,
        )

        lq = q.shape[2]
        if window is not None:
            # banded training forward: the windowed one-pass kernel is the
            # only LSE-emitting band implementation (decode convention)
            sp = static_positions or (lkv - lq, 0)
            if window >= lkv:
                window = None      # full band: fall through to causal
            elif not (sp == (lkv - lq, 0)
                      and window_onepass_eligible(lq, lkv, q.shape[3],
                                                  window)):
                raise NotImplementedError(
                    "windowed partial attention needs decode-convention "
                    "positions, lane-aligned L_kv and a VMEM-resident "
                    f"band; got Lq={lq}, Lkv={lkv}, window={window}, "
                    f"positions={sp}")
            else:
                return flash_attention_v1_window_partial(
                    q, k, v, window, scale=scale,
                    q_chunk=config.q_chunk, interpret=interpret,
                )
        if causal_partial_onepass_eligible(lq, lkv, q.shape[3]):
            sp = static_positions or (lkv - lq, 0)
            return flash_attention_v1_causal_partial(
                q, k, v, scale=scale,
                static_positions=(int(sp[0]), int(sp[1])),
                q_chunk=config.q_chunk, interpret=interpret,
            )
    # the launcher clamps blocks to the actual lengths itself; keep the
    # user's (validated, pow2) block sizes in the config and only size the
    # span so one block covers the whole shard
    block_kv_eff = min(config.block_kv, max(lkv, 8))
    cfg = SplitKVConfig(
        block_q=config.block_q,
        block_kv=config.block_kv,
        d_tile_qk=config.d_tile_qk,
        d_tile_v=config.d_tile_v,
        kv_tiles_per_block=cdiv(lkv, block_kv_eff),  # one block = shard
    )
    o_p, lse = flash_attention_splitkv_partial(
        q, k, v, config=cfg, scale=scale, interpret=interpret,
        causal=causal, positions=positions,
        static_positions=static_positions,
    )
    return o_p[:, :, 0], lse[:, :, 0]


def merge_partials(
    o_a: jax.Array, lse_a: jax.Array,     # [..., Lq, d], [..., Lq]
    o_b: jax.Array, lse_b: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Associative merge of two normalized partials.

    (o, lse) = merge(a, b) satisfies: attention over KV_a ∪ KV_b.  The
    identity element is (0, -inf).  Same math as the combine kernel
    (sim/splitkv.py:combine_partials) specialized to two operands and
    returning the merged lse so merges chain."""
    m = jnp.maximum(lse_a, lse_b)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w_a = jnp.where(jnp.isneginf(lse_a), 0.0, jnp.exp(lse_a - m_safe))
    w_b = jnp.where(jnp.isneginf(lse_b), 0.0, jnp.exp(lse_b - m_safe))
    denom = w_a + w_b
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o_a * (w_a / denom_safe)[..., None]
         + o_b * (w_b / denom_safe)[..., None])
    lse = m + jnp.log(denom_safe)
    lse = jnp.where(denom == 0.0, -jnp.inf, lse)
    return o, lse
