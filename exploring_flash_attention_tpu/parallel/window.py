"""Sliding-window attention x sequence parallelism: one-hop neighbor
exchange instead of a full ring.

A causal window of width ``w`` means a query at global position p attends
to keys [p - w + 1, p].  When the window fits inside one shard
(w <= L_local), a shard's queries only ever need keys from (a) its own KV
shard and (b) the TAIL of its left neighbor's shard — so the full
K/V rotation of ring attention (sp - 1 hops, parallel/ring.py) collapses
to ONE ``ppermute`` hop of a w-sized tail band.  This is exactly the
configuration a real L=128K windowed training run uses (SURVEY §5
long-context row), at O(w/L_global) of the ring's communication volume.

Decomposition (forward):

- **local partial**: the banded one-pass kernel over this shard's own KV
  (ops/attention_v1.py:_v1_onepass_window_kernel) — every row's band
  clipped at local position 0;
- **tail partial**: the same kernel in *suffix-band* form (``row_off``
  places the q rows strictly after the KV span) over the neighbor tail —
  only the first w-1 rows see anything, the rest come back as the merge
  identity (lse = -inf);
- the two normalized partials merge by the associative LSE rule
  (parallel/partials.py:merge_partials) — the reference's V2 combine
  (/root/reference/flash_attention_v2/numpy_gpu_like.py:247-288) with
  "KV blocks" = {local shard, neighbor tail}.

Shard 0 has no left neighbor: the tail exchange is a SHIFT (not a ring) —
``ppermute`` zero-fills absent sources — and shard 0's tail partial is
dropped by forcing its lse to -inf before the merge.

Backward: recompute the tail hop, concatenate [tail; local] KV, and run
the banded Pallas backward (ops/attention_bwd.py) ONCE over the
concatenation with static decode positions (q row 0 at position t) — the
band prunes all work outside the window, so cost stays O(L_local * w).
The tail's (dK, dV) slice ``ppermute``s back one hop right-to-left and
folds into the neighbor's gradient.  Shard 0's concatenated tail is the
shift's zero-fill, which makes its spurious gradient terms self-cancel:
recomputed p on those columns multiplies K = 0 in the dQ matmul, and the
garbage dK/dV tail slice is never sent anywhere (shard 0 is not a source
of the reverse shift).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.ops.attention_v1 import (
    STATS_LANES,
    window_onepass_eligible,
)
from exploring_flash_attention_tpu.parallel.partials import (
    attention_partial_local,
    merge_partials,
)


def _tail_len(window: int, l_local: int) -> int:
    """Neighbor-tail length: the w-1 positions a shard's first rows can
    see, lane-aligned up, capped at the shard length."""
    t = -(-(window - 1) // STATS_LANES) * STATS_LANES
    return min(t, l_local)


def _validate(l_local: int, d: int, window: int):
    if window > l_local:
        raise NotImplementedError(
            f"sp window attention needs window <= L_local (one-hop tail "
            f"exchange); got window={window}, L_local={l_local} — use "
            f"fewer sp shards or ring attention (window=None)")
    if not window_onepass_eligible(l_local, l_local, d, window):
        raise NotImplementedError(
            f"the banded one-pass kernel cannot serve this shape: "
            f"L_local={l_local} (must be a multiple of {STATS_LANES}), "
            f"d={d} (must be > 32), window={window}")


def _sp_window_fwd_core(
    q_l, k_l, v_l, axis_name, window, config, scale, interpret
):
    """One shard's forward: returns (o [B,H,Ll,d] f32, lse [B,H,Ll] f32)."""
    b, h, l_local, d = q_l.shape
    _validate(l_local, d, window)
    n_sp = jax.lax.axis_size(axis_name)
    t = _tail_len(window, l_local)

    # one-hop LEFT-neighbor tail, zero-filled at shard 0 (shift, not ring)
    shift = [(i, i + 1) for i in range(n_sp - 1)]
    k_tail = jax.lax.ppermute(k_l[:, :, l_local - t:], axis_name, shift)
    v_tail = jax.lax.ppermute(v_l[:, :, l_local - t:], axis_name, shift)

    # local banded partial (band clips at local position 0)
    o_a, lse_a = attention_partial_local(
        q_l, k_l, v_l, config=config, scale=scale,
        interpret=interpret, causal=True, window=window,
    )

    # suffix-band tail partial: only the first r rows can see the tail
    from exploring_flash_attention_tpu.ops.attention_v1 import (
        flash_attention_v1_window_partial,
    )

    r = t   # rows j <= w - 2 < t participate; t is already lane-aligned
    o_b, lse_b = flash_attention_v1_window_partial(
        q_l[:, :, :r], k_tail, v_tail, window,
        scale=scale, q_chunk=config.q_chunk, interpret=interpret,
        row_off=r,   # q row 0 sits at position t, right after the tail
    )
    if r < l_local:
        o_b = jnp.pad(o_b, ((0, 0), (0, 0), (0, l_local - r), (0, 0)))
        lse_b = jnp.pad(lse_b, ((0, 0), (0, 0), (0, l_local - r)),
                        constant_values=-jnp.inf)

    # shard 0's tail is the shift's zero-fill — drop its partial entirely
    is_first = jax.lax.axis_index(axis_name) == 0
    lse_b = jnp.where(is_first, -jnp.inf, lse_b)

    return merge_partials(o_a, lse_a, o_b, lse_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def sp_window_attention(
    q_l: jax.Array,               # [B, H, L_local, d]   (this shard)
    k_l: jax.Array,               # [B, H_kv, L_local, d]
    v_l: jax.Array,
    axis_name: str = "sp",
    window: int = 1024,
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Differentiable sliding-window attention over an sp-sharded sequence
    — call INSIDE ``shard_map`` on per-shard values.  One ``ppermute`` hop
    forward, two backward; O(L_local * window) compute per chip.

    GQA: ``k_l``/``v_l`` may carry fewer heads than ``q_l``."""
    o, _ = _sp_window_fwd_core(
        q_l, k_l, v_l, axis_name, window, config, scale, interpret
    )
    return o.astype(q_l.dtype)


def _sp_window_fwd(q_l, k_l, v_l, axis_name, window, config, scale,
                   interpret):
    o, lse = _sp_window_fwd_core(
        q_l, k_l, v_l, axis_name, window, config, scale, interpret
    )
    out = o.astype(q_l.dtype)
    return out, (q_l, k_l, v_l, out, lse)


def _sp_window_bwd(axis_name, window, config, scale, interpret, res, g):
    from exploring_flash_attention_tpu.ops.attention_bwd import (
        flash_attention_bwd,
    )

    q_l, k_l, v_l, out, lse = res
    l_local = q_l.shape[2]
    n_sp = jax.lax.axis_size(axis_name)
    t = _tail_len(window, l_local)

    # recompute the tail hop (cheaper than saving it as a residual)
    shift = [(i, i + 1) for i in range(n_sp - 1)]
    k_tail = jax.lax.ppermute(k_l[:, :, l_local - t:], axis_name, shift)
    v_tail = jax.lax.ppermute(v_l[:, :, l_local - t:], axis_name, shift)
    k_cat = jnp.concatenate([k_tail, k_l], axis=2)
    v_cat = jnp.concatenate([v_tail, v_l], axis=2)

    # one banded backward over [tail; local]: q row 0 at position t.
    # Shard 0's zero tail self-cancels (module docstring).
    dq, dk_cat, dv_cat = flash_attention_bwd(
        q_l, k_cat, v_cat, out, g.astype(q_l.dtype), lse,
        config=config, scale=scale, causal=True, interpret=interpret,
        static_positions=(t, 0), window=window,
    )

    # tail gradients travel back one hop right-to-left; shard n-1 is not
    # a target of the reverse shift (its own tail never left home) and
    # receives ppermute's zero-fill — a no-op in the .add below
    back = [(i, i - 1) for i in range(1, n_sp)]
    dk_tail = jax.lax.ppermute(dk_cat[:, :, :t], axis_name, back)
    dv_tail = jax.lax.ppermute(dv_cat[:, :, :t], axis_name, back)
    dk = dk_cat[:, :, t:].at[:, :, l_local - t:].add(dk_tail)
    dv = dv_cat[:, :, t:].at[:, :, l_local - t:].add(dv_tail)
    return (dq.astype(q_l.dtype), dk.astype(k_l.dtype),
            dv.astype(v_l.dtype))


sp_window_attention.defvjp(_sp_window_fwd, _sp_window_bwd)
