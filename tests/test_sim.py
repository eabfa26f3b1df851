"""Simulator layer vs oracle — the executable-spec gate (reference L1 role).

Every tile-loop variant must match the f64 oracle at tight tolerance in f32
and within the reference tolerance tiers in f16 (the reference's dtype-tiered
self-test discipline, SURVEY §4.1).
"""

import numpy as np
import pytest

from exploring_flash_attention_tpu.oracle.reference import (
    check_accuracy,
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.sim import (
    combine_partials,
    flash_attention_dtiled,
    flash_attention_splitkv_sim,
    flash_attention_tiled,
    flash_attention_tiled_fused,
    partial_attention_block,
)


@pytest.mark.parametrize("block_q,block_kv", [(8, 8), (16, 4), (4, 16), (32, 32)])
def test_tiled_matches_oracle_f32(block_q, block_kv):
    q, k, v = make_qkv(2, 2, 128, 32, dtype=np.float32, seed=0)
    ref = naive_attention(q, k, v)
    out = flash_attention_tiled(q, k, v, block_q, block_kv)
    assert error_stats(out, ref)["max_abs"] < 1e-5


def test_tiled_ragged_blocks():
    # L not divisible by block sizes
    q, k, v = make_qkv(1, 1, 100, 24, dtype=np.float32, seed=4)
    ref = naive_attention(q, k, v)
    out = flash_attention_tiled(q, k, v, block_q=16, block_kv=16)
    assert error_stats(out, ref)["max_abs"] < 1e-5


def test_tiled_fp16_within_reference_tolerances():
    # the reference's stress dtype (numpy_basic.py:110 uses fp16, L=2048,d=32)
    q, k, v = make_qkv(1, 2, 512, 32, dtype=np.float16, seed=5)
    ref = naive_attention(q, k, v)
    out = flash_attention_tiled(q, k, v, 8, 8)
    check_accuracy(out, ref, name="tiled fp16")


def test_fused_equals_clean():
    q, k, v = make_qkv(2, 2, 128, 64, dtype=np.float32, seed=6)
    clean = flash_attention_tiled(q, k, v, 8, 16)
    fused = flash_attention_tiled_fused(q, k, v, 8, 16)
    np.testing.assert_allclose(fused, clean, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("d,dtq,dtv", [(128, 16, 16), (128, 32, 64), (256, 64, 32)])
def test_dtiled_matches_oracle(d, dtq, dtv):
    q, k, v = make_qkv(1, 2, 128, d, dtype=np.float32, seed=7)
    ref = naive_attention(q, k, v)
    out = flash_attention_dtiled(q, k, v, 8, 8, d_tile_qk=dtq, d_tile_v=dtv)
    assert error_stats(out, ref)["max_abs"] < 1e-4


def test_dtiled_rejects_nondivisible_d():
    q, k, v = make_qkv(1, 1, 16, 48, dtype=np.float32)
    with pytest.raises(ValueError):
        flash_attention_dtiled(q, k, v, 8, 8, d_tile_qk=32, d_tile_v=32)


@pytest.mark.parametrize("kv_tiles_per_block", [1, 2, 4])
def test_splitkv_matches_oracle(kv_tiles_per_block):
    # reference V2 self-test shape: L=256, d=128 (numpy_gpu_like.py:408)
    q, k, v = make_qkv(1, 2, 256, 128, dtype=np.float32, seed=8)
    ref = naive_attention(q, k, v)
    out = flash_attention_splitkv_sim(
        q, k, v, 8, 8, kv_tiles_per_block=kv_tiles_per_block
    )
    assert error_stats(out, ref)["max_abs"] < 1e-4


def test_splitkv_equals_single_block_tiled():
    # with one kv block the split-KV path must equal plain tiled exactly
    q, k, v = make_qkv(1, 1, 64, 32, dtype=np.float32, seed=9)
    a = flash_attention_tiled(q, k, v, 8, 8)
    b = flash_attention_splitkv_sim(q, k, v, 8, 8, kv_tiles_per_block=8)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_combine_rule_associativity():
    """The LSE combine over N partials must equal one pass over the whole KV.

    This property is what makes cross-chip split-KV/ring attention correct —
    verify it directly on the primitive."""
    rng = np.random.default_rng(10)
    d, bq, span = 32, 8, 64
    q_tile = rng.standard_normal((bq, d)).astype(np.float32)
    ks = rng.standard_normal((4, span, d)).astype(np.float32)
    vs = rng.standard_normal((4, span, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)

    parts = [partial_attention_block(q_tile, ks[i], vs[i], scale, 16) for i in range(4)]
    o = combine_partials(
        np.stack([p[0] for p in parts]), np.stack([p[1] for p in parts])
    )
    full_o, _ = partial_attention_block(
        q_tile, ks.reshape(-1, d), vs.reshape(-1, d), scale, 16
    )
    np.testing.assert_allclose(o, full_o, atol=1e-5)
