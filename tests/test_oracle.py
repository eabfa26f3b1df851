"""Oracle self-consistency: numpy f64 oracle vs jnp oracle vs torch SDPA.

Role of the reference's cross-validation breadth (SURVEY §4.4): three
independent oracles must agree before anything else is trusted.
"""

import numpy as np
import pytest

from exploring_flash_attention_tpu.oracle.reference import (
    AccuracyError,
    check_accuracy,
    error_stats,
    make_qkv,
    naive_attention,
    naive_attention_jax,
)


def test_oracle_softmax_rows_sum_to_one():
    q, k, v = make_qkv(1, 1, 16, 8)
    ones = np.ones_like(v)
    out = naive_attention(q, k, ones)
    np.testing.assert_allclose(out, 1.0, atol=1e-12)


def test_oracle_single_kv_is_v():
    # with one KV position, softmax weight is 1 -> output == v broadcast
    q, k, v = make_qkv(2, 2, 8, 16, seq_len_kv=1)
    out = naive_attention(q, k, v)
    np.testing.assert_allclose(out, np.broadcast_to(v, out.shape), atol=1e-12)


def test_jax_oracle_matches_numpy_oracle():
    q, k, v = make_qkv(2, 3, 64, 32, dtype=np.float32, seed=1)
    ref = naive_attention(q, k, v)
    out = np.asarray(naive_attention_jax(q, k, v))
    stats = error_stats(out, ref)
    assert stats["max_abs"] < 1e-4, stats


def test_jax_oracle_causal():
    q, k, v = make_qkv(1, 2, 32, 16, dtype=np.float32, seed=2)
    ref = naive_attention(q, k, v, causal=True)
    out = np.asarray(naive_attention_jax(q, k, v, causal=True))
    assert error_stats(out, ref)["max_abs"] < 1e-4
    # causality: output at position 0 must equal attention over only k[0]
    np.testing.assert_allclose(
        np.asarray(out)[..., 0, :], v[..., 0, :], atol=1e-4
    )


def test_oracle_matches_torch_sdpa():
    torch = pytest.importorskip("torch")
    q, k, v = make_qkv(2, 2, 64, 32, dtype=np.float32, seed=3)
    ref = naive_attention(q, k, v)
    out = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    assert error_stats(out, ref)["max_abs"] < 1e-4


def test_check_accuracy_passes_and_fails():
    q, k, v = make_qkv(1, 1, 32, 16)
    ref = naive_attention(q, k, v)
    stats = check_accuracy(ref.astype(np.float32), ref, name="identity")
    assert stats["max_abs"] < 1e-6
    with pytest.raises(AccuracyError):
        check_accuracy(ref + 1.0, ref, name="broken")


def test_scale_override():
    q, k, v = make_qkv(1, 1, 16, 8)
    out_default = naive_attention(q, k, v)
    out_custom = naive_attention(q, k, v, scale=1.0 / np.sqrt(8))
    np.testing.assert_allclose(out_default, out_custom)
    out_other = naive_attention(q, k, v, scale=0.5)
    assert np.abs(out_other - out_default).max() > 1e-6
