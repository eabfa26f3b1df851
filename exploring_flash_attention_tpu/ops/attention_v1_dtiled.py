"""d-tiled V1 flash-attention Pallas kernel for large head dims.

TPU-native re-design of the reference's "true d-tiling" kernel
(flash_attention_v1_tiled_d/CUDA/flash_attention_v1.h): instead of staging
full (block, d) K/V tiles on-chip, the head dimension is streamed in
``d_tile_qk`` / ``d_tile_v`` chunks straight from HBM, with the score matrix
accumulated chunk-by-chunk and a full-width f32 output accumulator kept
resident (the VMEM analog of the reference's per-thread ``O_reg``,
tiled_d/flash_attention_v1.h:269-284).

Mapping of the reference's machinery:

- global->shared chunk loads inside the tile step (tiled_d
  flash_attention_v1.h:154-174, 209-226)  ->  explicit
  ``pltpu.make_async_copy`` DMAs from HBM-resident refs into
  double-buffered VMEM chunk scratch (the role of load_shared_memory.h's
  vectorized copy library);
- ``mat_mul_chunk_accumulate`` (:57-73)   ->  per-chunk MXU dot into an
  f32 S accumulator in VMEM;
- alpha-scaling hoisted before the V d-loop (the opt/V2 refinement,
  flash_attention_v2.h:213-219)           ->  one full-width multiply of
  O_acc before the chunked P@V accumulation.

On-chip memory per program is O(BQ*BK + (BQ+BK)*d_tile + BQ*d) versus the
non-tiled kernel's O((BQ+2*BK)*d + BQ*BK) input residency — the same VMEM
economy argument as the reference's 3.69 KB vs 8.22 KB shared-memory table
(tiled_d/README.md:13,211), which is what lets d grow to 512+ while keeping
large blocks.

Restrictions (asserted): L divisible by blocks, d divisible by both d tiles
— the d-tiled path targets large aligned shapes, mirroring the reference's
compile-time divisibility static_asserts.  Non-causal only, like the
reference.

When to use: only when a single (block, d) K/V tile would blow the VMEM
budget (d >= ~1024 at large blocks).  For d <= 512 with moderate L the
plain :func:`flash_attention_v1` (whose one-pass/streaming tiles hold the
full head dim) is substantially faster — d-tiling trades on-chip residency
for extra HBM chunk traffic, exactly as the reference's shared-memory
variant did (tiled_d/README.md:13).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import TileConfig, cdiv
from exploring_flash_attention_tpu.ops.attention_v1 import (
    NEG_INF,
    STATS_LANES,
    _resolve_interpret,
    dot_precision,
)


def _dtiled_kernel(
    q_ref, k_hbm, v_hbm,     # q: VMEM block (1, BQ, d); k/v: ANY [nbh, L, d]
    o_ref,                   # VMEM block (1, BQ, d)
    k_buf, v_buf,            # VMEM chunk scratch: (2, BK, DTQ), (2, BK, DTV)
    s_scratch,               # VMEM (BQ, BK) f32
    o_acc, m_ref, l_ref,     # VMEM (BQ, d) f32, (BQ, 128) f32 x2
    sems,                    # DMA semaphores (2, 2)
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    d_tile_qk: int,
    d_tile_v: int,
    head_dim: int,
    seq_len_kv: int,
):
    bh = pl.program_id(0)
    n_kv = seq_len_kv // block_kv
    n_cq = head_dim // d_tile_qk
    n_cv = head_dim // d_tile_v

    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    o_acc[...] = jnp.zeros_like(o_acc)

    # Q stays VMEM-resident for the whole program (the reference re-loads Q
    # chunks per KV tile because shared memory is KBs, tiled_d
    # flash_attention_v1.h:154-174; VMEM holds the full (BQ, d) block, so
    # only K/V stream in d-chunks)

    def k_dma(slot, k_start, c):
        return pltpu.make_async_copy(
            k_hbm.at[bh, pl.ds(k_start, block_kv), pl.ds(c * d_tile_qk, d_tile_qk)],
            k_buf.at[slot],
            sems.at[0, slot],
        )

    def v_dma(slot, k_start, c):
        return pltpu.make_async_copy(
            v_hbm.at[bh, pl.ds(k_start, block_kv), pl.ds(c * d_tile_v, d_tile_v)],
            v_buf.at[slot],
            sems.at[1, slot],
        )

    def kv_step(ki, _):
        k_start = ki * block_kv

        # ---- d-loop #1: S = sum_c Q_c K_c^T, double-buffered K DMAs ----
        k_dma(0, k_start, 0).start()

        def qk_chunk(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_cq)
            def _prefetch():
                k_dma(nxt, k_start, c + 1).start()

            k_dma(slot, k_start, c).wait()
            q_c = q_ref[0, :, pl.ds(c * d_tile_qk, d_tile_qk)]
            partial = jax.lax.dot_general(
                q_c, k_buf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q_c),
            )

            @pl.when(c == 0)
            def _first():
                s_scratch[...] = partial

            @pl.when(c > 0)
            def _rest():
                s_scratch[...] = s_scratch[...] + partial

            return ()

        jax.lax.fori_loop(0, n_cq, qk_chunk, (), unroll=False)

        s = s_scratch[...] * scale

        # ---- online-softmax state update (f32, full stats) ----
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])
        m_ref[...] = m_new
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        # alpha hoisted: one full-width rescale before the chunked P@V
        o_acc[...] = o_acc[...] * alpha[:, :1]
        p_cast = p.astype(v_buf.dtype)

        # ---- d-loop #2: O[:, c] += P V_c, double-buffered ----
        v_dma(0, k_start, 0).start()

        def v_chunk(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_cv)
            def _prefetch():
                v_dma(nxt, k_start, c + 1).start()

            v_dma(slot, k_start, c).wait()
            pv = jax.lax.dot_general(
                p_cast, v_buf[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(p_cast),
            )
            col = pl.ds(c * d_tile_v, d_tile_v)
            o_acc[:, col] = o_acc[:, col] + pv
            return ()

        jax.lax.fori_loop(0, n_cv, v_chunk, (), unroll=False)
        return ()

    jax.lax.fori_loop(0, n_kv, kv_step, (), unroll=False)

    # finalize O = O_acc / l (reference tiled_d :300-308)
    l = l_ref[:, :1]
    o_ref[0] = (o_acc[...] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("config", "scale", "interpret", "out_dtype"),
)
def flash_attention_v1_dtiled(
    q: jax.Array,             # [B, H, L, d]
    k: jax.Array,
    v: jax.Array,
    config: TileConfig = TileConfig(block_q=256, block_kv=256,
                                    d_tile_qk=128, d_tile_v=128),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """d-tiled fused attention forward for large head dims (d >= 128)."""
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    d_tile_qk = config.d_tile_qk or min(d, 128)
    d_tile_v = config.d_tile_v or min(d, 128)
    if d % d_tile_qk or d % d_tile_v:
        raise ValueError(f"head_dim {d} must be divisible by d tiles "
                         f"({d_tile_qk}, {d_tile_v})")
    block_q = min(config.block_q, lq)
    block_kv = min(config.block_kv, lkv)
    if lq % block_q or lkv % block_kv:
        raise ValueError(
            f"d-tiled path requires L divisible by blocks: "
            f"Lq={lq}%{block_q}, Lkv={lkv}%{block_kv}"
        )
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    out_dtype = out_dtype or q.dtype

    n_bh = b * h
    n_q = lq // block_q
    qf = q.reshape(n_bh, lq, d)
    kf = k.reshape(n_bh, lkv, d)
    vf = v.reshape(n_bh, lkv, d)

    kernel = functools.partial(
        _dtiled_kernel,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        d_tile_qk=d_tile_qk,
        d_tile_v=d_tile_v,
        head_dim=d,
        seq_len_kv=lkv,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_kv, d_tile_qk), k.dtype),
            pltpu.VMEM((2, block_kv, d_tile_v), v.dtype),
            pltpu.VMEM((block_q, block_kv), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_resolve_interpret(interpret),
    )(qf, kf, vf)
    return out.reshape(b, h, lq, d)
