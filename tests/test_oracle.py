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


def test_kernels_match_jax_dot_product_attention():
    """Independent third-party cross-validation of the PALLAS KERNELS (not
    just the oracle): XLA's own jax.nn.dot_product_attention is an
    implementation this repo did not write — the role of the reference's
    PyTorch SDPA check (flash_attention_v1/pytorch_imp.py:12) and its
    Dao-AILab comparison (root README.md:73-76)."""
    import jax
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.ops import (
        flash_attention_v1,
        flash_attention_v2,
    )

    cfg = TileConfig(block_q=64, block_kv=64)
    for causal in (False, True):
        q, k, v = make_qkv(2, 4, 128, 64, dtype=np.float32, seed=21)
        qj, kj, vj = map(jnp.asarray, (q, k, v))
        # jax.nn.dot_product_attention expects [B, L, H, d]
        ref = jax.nn.dot_product_attention(
            qj.transpose(0, 2, 1, 3), kj.transpose(0, 2, 1, 3),
            vj.transpose(0, 2, 1, 3), is_causal=causal,
        ).transpose(0, 2, 1, 3)
        out1 = flash_attention_v1(qj, kj, vj, config=cfg, causal=causal)
        err1 = error_stats(np.asarray(out1), np.asarray(ref))["max_abs"]
        assert err1 < 1e-5, (causal, err1)
    # v2 split-KV pair (non-causal multi-span) vs the same third party
    from exploring_flash_attention_tpu.configs import SplitKVConfig

    out2 = flash_attention_v2(
        qj, kj, vj, config=SplitKVConfig(
            block_q=64, block_kv=64, kv_tiles_per_block=1),
    )
    ref_nc = jax.nn.dot_product_attention(
        qj.transpose(0, 2, 1, 3), kj.transpose(0, 2, 1, 3),
        vj.transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3)
    err2 = error_stats(np.asarray(out2), np.asarray(ref_nc))["max_abs"]
    assert err2 < 1e-5, err2


def test_kernels_match_jax_dpa_bf16():
    """Same third-party check at storage precision (bf16 inputs)."""
    import jax
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.ops import flash_attention_v1

    q, k, v = make_qkv(1, 2, 128, 64, dtype=np.float32, seed=22)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    ref = jax.nn.dot_product_attention(
        qb.transpose(0, 2, 1, 3), kb.transpose(0, 2, 1, 3),
        vb.transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3).astype(jnp.float32)
    out = flash_attention_v1(
        qb, kb, vb, config=TileConfig(block_q=64, block_kv=64),
        out_dtype=jnp.float32,
    )
    err = error_stats(np.asarray(out), np.asarray(ref))["max_abs"]
    # both sides round storage to bf16; agreement at the 1e-2 tier of the
    # reference's fp16 checks (common/reference.py max_abs_tol)
    assert err < 1e-2, err
