"""NumPy simulator for the d-tiled V1 algorithm.

Role of reference flash_attention_v1_tiled_d/numpy_basic.py: for large head
dims, the Q@K^T contraction streams the head dimension in ``d_tile_qk``
chunks and the P@V product streams V's columns in ``d_tile_v`` chunks, so the
working set per tile step is O(block * d_tile) instead of O(block * d).

On TPU the "shared memory" being economized is VMEM: the simulator models
what the d-tiled Pallas kernel does with per-chunk HBM->VMEM DMAs and a
full-width f32 output accumulator (the analog of the reference's
register-resident O_reg, tiled_d/CUDA/flash_attention_v1.h:269-284).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from exploring_flash_attention_tpu.configs import cdiv


def process_kv_tile_dtiled(
    q_tile: np.ndarray,       # [bq, d] f32 (global; chunks "loaded" on demand)
    k_tile: np.ndarray,       # [bk, d] f32
    v_tile: np.ndarray,       # [bk, d] f32
    m: np.ndarray, l: np.ndarray, o_acc: np.ndarray,
    scale: float,
    d_tile_qk: int,
    d_tile_v: int,
):
    """One online-softmax step with both matmuls d-chunked.

    d-loop #1 accumulates partial scores over q/k chunks (reference
    tiled_d/numpy_basic.py:48-58); d-loop #2 applies the alpha rescale once,
    then accumulates P @ V per v-column chunk (reference :88-94 — alpha
    hoisted before the V loop as in the V2/opt kernels)."""
    d = q_tile.shape[-1]
    bq = q_tile.shape[0]
    bk = k_tile.shape[0]

    # d-loop #1: S += Q[:, c] @ K[:, c].T per chunk
    s = np.zeros((bq, bk), dtype=np.float32)
    for c0 in range(0, d, d_tile_qk):
        q_chunk = q_tile[:, c0:c0 + d_tile_qk]      # simulated DMA of a chunk
        k_chunk = k_tile[:, c0:c0 + d_tile_qk]
        s += q_chunk @ k_chunk.T
    s *= scale

    m_new = np.maximum(m, s.max(axis=-1))
    alpha = np.exp(m - m_new)
    p = np.exp(s - m_new[:, None])
    l_new = l * alpha + p.sum(axis=-1)

    # alpha applied once, then d-loop #2: O[:, c] += P @ V[:, c] per chunk
    o_new = o_acc * alpha[:, None]
    for c0 in range(0, d, d_tile_v):
        v_chunk = v_tile[:, c0:c0 + d_tile_v]       # simulated DMA of a chunk
        o_new[:, c0:c0 + d_tile_v] += p @ v_chunk
    return m_new, l_new, o_new


def flash_attention_dtiled(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    block_q: int = 8,
    block_kv: int = 8,
    d_tile_qk: int = 16,
    d_tile_v: int = 16,
    scale: Optional[float] = None,
) -> np.ndarray:
    """d-tiled flash attention on [..., L, d] arrays (spec for the d-tiled kernel)."""
    *_, lq, d = q.shape
    if d % d_tile_qk or d % d_tile_v:
        raise ValueError(f"head_dim {d} must be divisible by d tiles "
                         f"({d_tile_qk}, {d_tile_v})")
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    lead = q.shape[:-2]
    lk = k.shape[-2]
    qf = q.reshape(-1, lq, d).astype(np.float32)
    kf = k.reshape(-1, lk, d).astype(np.float32)
    vf = v.reshape(-1, lk, d).astype(np.float32)
    out = np.empty_like(qf)

    for bh in range(qf.shape[0]):
        for qi in range(cdiv(lq, block_q)):
            q0 = qi * block_q
            q_tile = qf[bh, q0:q0 + block_q]
            bq = q_tile.shape[0]
            m = np.full((bq,), -np.inf, dtype=np.float32)
            l = np.zeros((bq,), dtype=np.float32)
            o_acc = np.zeros((bq, d), dtype=np.float32)
            for ki in range(cdiv(lk, block_kv)):
                k0 = ki * block_kv
                m, l, o_acc = process_kv_tile_dtiled(
                    q_tile, kf[bh, k0:k0 + block_kv], vf[bh, k0:k0 + block_kv],
                    m, l, o_acc, scale, d_tile_qk, d_tile_v,
                )
            out[bh, q0:q0 + block_q] = o_acc / l[:, None]
    return out.reshape(*lead, lq, d).astype(q.dtype)
