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


def test_window_and_kvquant_match_jax_dpa():
    """External-referee coverage for the remaining kernel families
    (VERDICT r4 item 4): sliding-window attention vs jax.nn's
    local_window_size, and the quantized-KV kernel vs jax.nn run on the
    DEQUANTIZED operands — both referee against an implementation this
    repo did not write.  Note: jax.nn's is_causal aligns the diagonal
    top-left for L_q != L_kv while this repo (like decode-style flash
    kernels) aligns bottom-right, so cross-length causal referees pass an
    explicit bottom-right mask instead of is_causal."""
    import jax
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.ops import (
        flash_attention_kvquant,
        flash_attention_v1,
    )
    from exploring_flash_attention_tpu.ops.quant import (
        dequantize, quantize_int8,
    )

    def jnn(q, k, v, **kw):
        return jax.nn.dot_product_attention(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), **kw
        ).swapaxes(1, 2)

    # sliding window, f32: window=w here means "last w positions incl."
    # == jax.nn local_window_size (w-1, 0) under is_causal
    q, k, v = make_qkv(2, 2, 256, 64, dtype=np.float32, seed=31)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    ref = jnn(qj, kj, vj, is_causal=True, local_window_size=(63, 0))
    out = flash_attention_v1(
        qj, kj, vj, config=TileConfig(block_q=64, block_kv=64),
        causal=True, window=64,
    )
    err = error_stats(np.asarray(out), np.asarray(ref))["max_abs"]
    assert err < 1e-5, err

    # bottom-right cross-length causal via explicit mask (convention
    # check: the jax.nn referee agrees once given this repo's mask)
    qc, kc, vc = make_qkv(2, 2, 128, 64, dtype=np.float32, seed=32)
    kc2, vc2 = kc[:, :, :], vc[:, :, :]
    qshort = jnp.asarray(qc[:, :, :64])
    lq, lkv = 64, 128
    row = np.arange(lq)[:, None]
    col = np.arange(lkv)[None, :]
    mask = jnp.asarray(col <= row + (lkv - lq))
    ref = jnn(qshort, jnp.asarray(kc2), jnp.asarray(vc2),
              mask=mask[None, None])
    out = flash_attention_v1(
        qshort, jnp.asarray(kc2), jnp.asarray(vc2),
        config=TileConfig(block_q=64, block_kv=64), causal=True,
    )
    err = error_stats(np.asarray(out), np.asarray(ref))["max_abs"]
    assert err < 1e-5, err

    # kvquant int8: referee = jax.nn on the dequantized K/V
    kq = quantize_int8(jnp.asarray(k), block=128)
    vq = quantize_int8(jnp.asarray(v), block=128)
    ref = jnn(qj, dequantize(kq), dequantize(vq))
    out = flash_attention_kvquant(
        qj, kq, vq, config=TileConfig(128, 128), out_dtype=jnp.float32,
    )
    err = error_stats(np.asarray(out), np.asarray(ref))["max_abs"]
    assert err < 2e-5, err


def test_gqa_matches_jax_dpa():
    """GQA grouping vs jax.nn.dot_product_attention's native grouped
    heads (independent of this repo's repeat-free BlockSpec routing)."""
    import jax
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.ops import flash_attention_v1

    q, _, _ = make_qkv(2, 8, 128, 64, dtype=np.float32, seed=33)
    _, k, v = make_qkv(2, 2, 128, 64, dtype=np.float32, seed=34)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    ref = jax.nn.dot_product_attention(
        qj.swapaxes(1, 2), kj.swapaxes(1, 2), vj.swapaxes(1, 2),
    ).swapaxes(1, 2)
    out = flash_attention_v1(
        qj, kj, vj, config=TileConfig(block_q=64, block_kv=64))
    err = error_stats(np.asarray(out), np.asarray(ref))["max_abs"]
    assert err < 1e-5, err
