"""NumPy simulator for the split-KV V2 two-kernel decomposition.

Role of reference flash_attention_v2/numpy_gpu_like.py: a simulated grid of
forward blocks, each owning a contiguous span of KV tiles, writes partial
results to a workspace; a combine pass merges them with softmax rescaling.
This is the repo's "test multi-block without hardware" pattern (SURVEY §4.3)
and — lifted across chips — the math of ring / cross-host split-KV attention.

Deliberate idiomatic change vs the reference: the workspace stores the
**normalized** partial output plus the log-sum-exp ``lse = m + log(l)``
instead of the raw (m, l) pair (reference stores raw m and l,
flash_attention_v2/CUDA/flash_attention_v2.h:321-340).  The combine rule

    lse_g = logsumexp_k(lse_k)
    O     = sum_k exp(lse_k - lse_g) * O_k

is algebraically identical but more robust at low precision and is what the
TPU kernels and the cross-chip combine exchange.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from exploring_flash_attention_tpu.configs import cdiv
from exploring_flash_attention_tpu.sim.tile_loop import process_kv_tile


def partial_attention_block(
    q_tile: np.ndarray,       # [bq, d]
    k_span: np.ndarray,       # [span, d]  this block's KV slice
    v_span: np.ndarray,       # [span, d]
    scale: float,
    block_kv: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """One simulated forward block: stream KV tiles of the local span, return
    (normalized partial output [bq, d], lse [bq]).

    Role of reference numpy_gpu_like.py:174-226 (``partial_attention_kernel``),
    with the LSE workspace convention."""
    bq, d = q_tile.shape
    m = np.full((bq,), -np.inf, dtype=np.float32)
    l = np.zeros((bq,), dtype=np.float32)
    o_acc = np.zeros((bq, d), dtype=np.float32)
    for k0 in range(0, k_span.shape[0], block_kv):
        m, l, o_acc = process_kv_tile(
            q_tile, k_span[k0:k0 + block_kv], v_span[k0:k0 + block_kv],
            m, l, o_acc, scale,
        )
    # span guaranteed non-empty by the orchestrator; l > 0
    o_partial = o_acc / l[:, None]
    lse = m + np.log(l)
    return o_partial, lse


def combine_partials(
    o_partials: np.ndarray,   # [nkb, ..., bq, d] normalized partial outputs
    lses: np.ndarray,         # [nkb, ..., bq]
) -> np.ndarray:
    """Merge split-KV partials with softmax rescaling.

    Role of reference ``reduction_kernel`` (numpy_gpu_like.py:270-288), in the
    LSE convention:  weights w_k = exp(lse_k - logsumexp(lse)) sum to 1, so
    O = sum_k w_k * O_k.  This exact rule is reused verbatim by the
    cross-chip combine in parallel/splitkv_xhost.py."""
    lse_g = np.max(lses, axis=0)
    # guard fully-masked rows (all -inf) against nan
    safe = np.where(np.isinf(lse_g), 0.0, lse_g)
    w = np.exp(lses - safe)
    denom = w.sum(axis=0)
    w = w / np.where(denom == 0.0, 1.0, denom)
    return np.einsum("k...,k...d->...d", w.astype(np.float32), o_partials)


def flash_attention_splitkv_sim(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    block_q: int = 8,
    block_kv: int = 8,
    kv_tiles_per_block: int = 4,
    scale: Optional[float] = None,
) -> np.ndarray:
    """Simulated two-phase split-KV attention on [..., L, d] arrays.

    Phase 1 walks the (bh, q_block, kv_block) forward grid writing the
    (o_partial, lse) workspace; a barrier comment marks where the
    inter-kernel device sync sits in the real pair; phase 2 walks the
    (bh, q_block) combine grid.  Role of reference
    numpy_gpu_like.py:343-405 (``flash_attention_tiled_v2``)."""
    *lead, lq, d = q.shape
    lk = k.shape[-2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qf = q.reshape(-1, lq, d).astype(np.float32)
    kf = k.reshape(-1, lk, d).astype(np.float32)
    vf = v.reshape(-1, lk, d).astype(np.float32)
    nbh = qf.shape[0]
    nq = cdiv(lq, block_q)
    span = kv_tiles_per_block * block_kv
    nkb = cdiv(lk, span)

    # workspace (HBM in the real pair): normalized partials + lse
    ws_o = np.zeros((nbh, nkb, nq, block_q, d), dtype=np.float32)
    ws_lse = np.full((nbh, nkb, nq, block_q), -np.inf, dtype=np.float32)

    # ---- phase 1: forward grid (bh, q_block, kv_block) ----
    for bh in range(nbh):
        for qi in range(nq):
            q0 = qi * block_q
            q_tile = qf[bh, q0:q0 + block_q]
            bq = q_tile.shape[0]
            for kb in range(nkb):
                k0 = kb * span
                o_p, lse = partial_attention_block(
                    q_tile, kf[bh, k0:k0 + span], vf[bh, k0:k0 + span],
                    scale, block_kv,
                )
                ws_o[bh, kb, qi, :bq] = o_p
                ws_lse[bh, kb, qi, :bq] = lse

    # ---- device-wide barrier would sit here (phase boundary) ----

    # ---- phase 2: combine grid (bh, q_block) ----
    out = np.empty_like(qf)
    for bh in range(nbh):
        for qi in range(nq):
            q0 = qi * block_q
            bq = min(block_q, lq - q0)
            merged = combine_partials(ws_o[bh, :, qi, :bq], ws_lse[bh, :, qi, :bq])
            out[bh, q0:q0 + bq] = merged
    return out.reshape(*lead, lq, d).astype(q.dtype)
