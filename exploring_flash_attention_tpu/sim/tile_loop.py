"""NumPy tile-loop simulator — the executable spec for the fused V1 kernel.

Role of the reference's L1 Python ladder (flash_attention_v1/numpy_basic.py ->
numpy_gpu_like_opt2.py), compressed to two rungs as planned in SURVEY.md §7:

- :func:`flash_attention_tiled` — the clean statement of the online-softmax
  tile algorithm (the ``process_kv_tile`` 10-step update of
  numpy_basic.py:7-66),
- :func:`flash_attention_tiled_fused` — the fused / minimal-temporary form
  the Pallas kernel actually implements (role of numpy_gpu_like_opt2.py:
  S reused in place, only S and alpha as temporaries per tile step).

The "fake GPU" here is a fake *TPU grid*: the outer loops walk exactly the
(batch*head, q_block) grid and in-kernel KV fori_loop of the Pallas kernel,
and the per-tile state (m, l, o_acc) lives in f32 exactly like the VMEM
scratch accumulators do.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from exploring_flash_attention_tpu.configs import cdiv


def process_kv_tile(
    q_tile: np.ndarray,       # [bq, d]  (any float dtype; promoted to f32)
    k_tile: np.ndarray,       # [bk, d]
    v_tile: np.ndarray,       # [bk, d]
    m: np.ndarray,            # [bq]    running row max (f32)
    l: np.ndarray,            # [bq]    running row sum (f32)
    o_acc: np.ndarray,        # [bq, d] unnormalized output accumulator (f32)
    scale: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One online-softmax update step (the contract every kernel implements).

    Given running state (m, l, o_acc) over previously seen KV tiles, folds in
    one more tile:

        s      = q_tile @ k_tile.T * scale
        m_new  = max(m, rowmax(s))
        alpha  = exp(m - m_new)
        p      = exp(s - m_new)
        l      = l * alpha + rowsum(p)
        o_acc  = o_acc * alpha + p @ v_tile

    Matches the update rules of reference numpy_basic.py:7-66.
    """
    s = q_tile.astype(np.float32) @ k_tile.astype(np.float32).T * scale
    m_new = np.maximum(m, s.max(axis=-1))
    alpha = np.exp(m - m_new)
    p = np.exp(s - m_new[:, None])
    l_new = l * alpha + p.sum(axis=-1)
    o_new = o_acc * alpha[:, None] + p @ v_tile.astype(np.float32)
    return m_new, l_new, o_new


def flash_attention_tiled(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    block_q: int = 8,
    block_kv: int = 8,
    scale: Optional[float] = None,
) -> np.ndarray:
    """Clean tiled flash attention on [..., L, d] arrays.

    Outer structure mirrors the Pallas grid: independent Q blocks (parallel
    grid axis) each stream all KV tiles (in-kernel loop), then normalize
    O = o_acc / l.  Role of numpy_basic.py:69-105.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    *lead, lq, d = q.shape
    lk = k.shape[-2]
    qf = q.reshape(-1, lq, d)
    kf = k.reshape(-1, lk, d)
    vf = v.reshape(-1, lk, d)
    out = np.empty((qf.shape[0], lq, d), dtype=np.float32)

    for bh in range(qf.shape[0]):                      # grid axis 0: batch*head
        for qi in range(cdiv(lq, block_q)):            # grid axis 1: Q block
            q0 = qi * block_q
            q_tile = qf[bh, q0:q0 + block_q]
            bq = q_tile.shape[0]
            m = np.full((bq,), -np.inf, dtype=np.float32)
            l = np.zeros((bq,), dtype=np.float32)
            o_acc = np.zeros((bq, d), dtype=np.float32)
            for ki in range(cdiv(lk, block_kv)):       # in-kernel KV loop
                k0 = ki * block_kv
                m, l, o_acc = process_kv_tile(
                    q_tile, kf[bh, k0:k0 + block_kv], vf[bh, k0:k0 + block_kv],
                    m, l, o_acc, scale,
                )
            out[bh, q0:q0 + block_q] = o_acc / l[:, None]
    return out.reshape(*lead, lq, d).astype(q.dtype)


def flash_attention_tiled_fused(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    block_q: int = 8,
    block_kv: int = 8,
    scale: Optional[float] = None,
) -> np.ndarray:
    """Fused / minimal-temporary form — the shape of the actual kernel body.

    Per tile step only two live temporaries exist beyond the carried state:
    the score matrix ``s`` (reused in place: scores -> shifted -> exp'd, as
    in reference numpy_gpu_like_opt2.py:163-183) and the row rescale
    ``alpha``.  The m-update, alpha computation, and l-update are fused into
    single passes.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    *lead, lq, d = q.shape
    lk = k.shape[-2]
    qf = q.reshape(-1, lq, d).astype(np.float32)
    kf = k.reshape(-1, lk, d).astype(np.float32)
    vf = v.reshape(-1, lk, d).astype(np.float32)
    out = np.empty((qf.shape[0], lq, d), dtype=np.float32)

    n_kv = cdiv(lk, block_kv)
    for bh in range(qf.shape[0]):
        for qi in range(cdiv(lq, block_q)):
            q0 = qi * block_q
            q_tile = qf[bh, q0:q0 + block_q]
            bq = q_tile.shape[0]
            m = np.full((bq,), -np.inf, dtype=np.float32)
            l = np.zeros((bq,), dtype=np.float32)
            o_acc = np.zeros((bq, d), dtype=np.float32)
            for ki in range(n_kv):
                k0 = ki * block_kv
                # temp 1: s, computed and then overwritten in place
                s = q_tile @ kf[bh, k0:k0 + block_kv].T
                s *= scale
                # fused rowmax + m update + alpha (one pass over state)
                m_new = np.maximum(m, s.max(axis=-1))
                alpha = np.exp(m - m_new)              # temp 2
                m = m_new
                # s <- exp(s - m) in place
                np.exp(s - m[:, None], out=s)
                # fused l update: l = l*alpha + rowsum(s)
                l *= alpha
                l += s.sum(axis=-1)
                # fused o update: o = o*alpha + s @ V
                o_acc *= alpha[:, None]
                o_acc += s @ vf[bh, k0:k0 + block_kv]
            out[bh, q0:q0 + block_q] = o_acc / l[:, None]
    return out.reshape(*lead, lq, d).astype(q.dtype)
