"""Split-KV V2 Pallas pair vs oracle, sim, and the V1 kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import SplitKVConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.ops import (
    flash_attention_splitkv_partial,
    flash_attention_v1,
    flash_attention_v2,
    splitkv_combine,
)


def run_v2(q, k, v, **kw):
    return np.asarray(
        flash_attention_v2(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kw)
    )


@pytest.mark.parametrize("kv_tiles_per_block", [1, 2, 4])
def test_v2_matches_oracle(kv_tiles_per_block):
    q, k, v = make_qkv(1, 2, 512, 128, dtype=np.float32, seed=0)
    cfg = SplitKVConfig(
        block_q=128, block_kv=128, kv_tiles_per_block=kv_tiles_per_block
    )
    out = run_v2(q, k, v, config=cfg)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v2_single_block_equals_v1():
    q, k, v = make_qkv(1, 1, 256, 64, dtype=np.float32, seed=1)
    cfg = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=2)
    a = run_v2(q, k, v, config=cfg)
    b = np.asarray(
        flash_attention_v1(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_v2_partial_lse_is_logsumexp():
    # the lse output must equal log(sum(exp(scores))) over the local span
    q, k, v = make_qkv(1, 1, 128, 64, dtype=np.float32, seed=2)
    cfg = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=1)
    o_p, lse = flash_attention_splitkv_partial(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), config=cfg
    )
    assert o_p.shape == (1, 1, 1, 128, 64)
    assert lse.shape == (1, 1, 1, 128)
    scale = 1.0 / np.sqrt(64)
    scores = q[0, 0] @ k[0, 0].T * scale
    expected_lse = np.log(np.exp(scores).sum(axis=-1))
    np.testing.assert_allclose(np.asarray(lse)[0, 0, 0], expected_lse, rtol=1e-5)


def test_v2_combine_matches_sim_combine():
    from exploring_flash_attention_tpu.sim import combine_partials

    rng = np.random.default_rng(3)
    b, h, nkb, lq, d = 1, 2, 3, 128, 64
    o_p = rng.standard_normal((b, h, nkb, lq, d)).astype(np.float32)
    lse = rng.standard_normal((b, h, nkb, lq)).astype(np.float32)
    out = np.asarray(splitkv_combine(jnp.asarray(o_p), jnp.asarray(lse)))
    for bi in range(b):
        for hi in range(h):
            ref = combine_partials(o_p[bi, hi], lse[bi, hi])
            np.testing.assert_allclose(out[bi, hi], ref, atol=1e-5)


def test_v2_causal():
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=4)
    cfg = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=1)
    out = run_v2(q, k, v, config=cfg, causal=True)
    assert error_stats(out, naive_attention(q, k, v, causal=True))["max_abs"] < 2e-5


def test_v2_multi_span_streaming_fallback():
    # one_pass=False forces the streaming span kernel on the same shapes
    # the multi-span one-pass path handles — keeps both in lockstep
    q, k, v = make_qkv(1, 2, 512, 128, dtype=np.float32, seed=0)
    cfg = SplitKVConfig(
        block_q=128, block_kv=128, kv_tiles_per_block=2, one_pass=False
    )
    out = run_v2(q, k, v, config=cfg)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v2_multi_span_causal_matches_streaming():
    # causal multi-span: dead-span skip + traced-coordinate masking must
    # agree with the streaming kernel's per-tile masking
    q, k, v = make_qkv(1, 2, 512, 64, dtype=np.float32, seed=8)
    fast = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=1)
    slow = SplitKVConfig(
        block_q=128, block_kv=128, kv_tiles_per_block=1, one_pass=False
    )
    a = run_v2(q, k, v, config=fast, causal=True)
    b = run_v2(q, k, v, config=slow, causal=True)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    assert error_stats(a, naive_attention(q, k, v, causal=True))["max_abs"] < 2e-5


def test_v2_multi_span_positions():
    # traced shard offsets through the multi-span one-pass path: a shard
    # whose kv rows start at global position 128 under a causal mask
    q, k, v = make_qkv(1, 1, 128, 64, dtype=np.float32, seq_len_kv=256, seed=9)
    cfg = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=1)
    o_p, lse = flash_attention_splitkv_partial(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), config=cfg,
        causal=True,
        positions=(jnp.int32(128), jnp.int32(0)),
    )
    out = np.asarray(splitkv_combine(o_p, lse))
    # oracle: q rows at positions 128..255 attending to kv rows 0..255
    scale = 1.0 / np.sqrt(64)
    s = q[0, 0] @ k[0, 0].T * scale
    mask = np.arange(256)[None, :] <= (np.arange(128) + 128)[:, None]
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(axis=-1, keepdims=True))
    ref = (p / p.sum(axis=-1, keepdims=True)) @ v[0, 0]
    np.testing.assert_allclose(out[0, 0], ref, atol=1e-5)


def test_v2_ragged_kv():
    # L_kv=300: ragged vs block_kv AND vs kv span
    q, k, v = make_qkv(1, 1, 128, 64, dtype=np.float32, seq_len_kv=300, seed=5)
    cfg = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=1)
    out = run_v2(q, k, v, config=cfg)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v2_decode_shape():
    # flash-decoding: 8 queries vs long KV split 4 ways
    q, k, v = make_qkv(2, 4, 8, 128, dtype=np.float32, seq_len_kv=2048, seed=6)
    cfg = SplitKVConfig(block_q=8, block_kv=512, kv_tiles_per_block=1)
    out = run_v2(q, k, v, config=cfg)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v2_bf16():
    q, k, v = make_qkv(1, 4, 512, 128, dtype=np.float32, seed=7)
    qb, kb, vb = (x.astype(jnp.bfloat16).astype(np.float32) for x in (q, k, v))
    cfg = SplitKVConfig(block_q=128, block_kv=128, kv_tiles_per_block=2)
    out = run_v2(
        qb.astype(jnp.bfloat16), kb.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
        config=cfg, out_dtype=jnp.float32,
    )
    assert error_stats(out, naive_attention(qb, kb, vb))["max_abs"] < 1.5e-2
