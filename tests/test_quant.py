"""Quantization primitives + fused-dequant attention kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    check_accuracy,
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.ops import flash_attention_kvquant
from exploring_flash_attention_tpu.ops.quant import (
    dequantize,
    quantize_fp8,
    quantize_int8,
)


def test_int8_roundtrip_error_bounded():
    q, _, _ = make_qkv(2, 2, 256, 64, dtype=np.float32, seed=0)
    qt = quantize_int8(jnp.asarray(q), block=128)
    assert qt.values.dtype == jnp.int8
    assert qt.scales.shape == (2, 2, 2)
    err = np.abs(np.asarray(dequantize(qt)) - q).max()
    # absmax/127 quantization step bound: |x|max ~ 4.5 sigma -> step ~ 0.04
    assert err < np.abs(q).max() / 127.0 * 0.5 + 1e-6


def test_fp8_roundtrip_better_dynamic_range():
    x = np.random.default_rng(1).standard_normal((1, 1, 128, 64)).astype(np.float32)
    x[0, 0, 0, 0] = 40.0  # outlier
    qt8 = quantize_int8(jnp.asarray(x), block=128)
    qtf = quantize_fp8(jnp.asarray(x), block=128)
    err8 = np.abs(np.asarray(dequantize(qt8)) - x)
    errf = np.abs(np.asarray(dequantize(qtf)) - x)
    # fp8 should hurt small values less in the presence of the outlier
    small = np.abs(x) < 0.1
    assert errf[small].mean() < err8[small].mean()


def test_ragged_l_quantization():
    q, _, _ = make_qkv(1, 1, 200, 64, dtype=np.float32, seed=2)
    qt = quantize_int8(jnp.asarray(q), block=128)
    assert qt.scales.shape == (1, 1, 2)
    err = np.abs(np.asarray(dequantize(qt)) - q).max()
    assert err < 0.05


@pytest.mark.parametrize("one_pass", [None, False])
@pytest.mark.parametrize("quantizer", [quantize_int8, quantize_fp8])
def test_kvquant_attention_matches_dequant_oracle(quantizer, one_pass):
    q, k, v = make_qkv(1, 2, 256, 128, dtype=np.float32, seed=3)
    kq = quantizer(jnp.asarray(k), block=128)
    vq = quantizer(jnp.asarray(v), block=128)
    out = np.asarray(
        flash_attention_kvquant(
            jnp.asarray(q), kq, vq,
            config=TileConfig(128, 128, one_pass=one_pass),
            out_dtype=jnp.float32,
        )
    )
    # exact reference: attention on the dequantized K/V — isolates kernel
    # error from quantization error
    ref = naive_attention(q, np.asarray(dequantize(kq)), np.asarray(dequantize(vq)))
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_kvquant_attention_vs_full_precision():
    # end-to-end error vs unquantized attention stays within the harness tiers
    q, k, v = make_qkv(1, 2, 512, 128, dtype=np.float32, seed=4)
    kq = quantize_int8(jnp.asarray(k), block=128)
    vq = quantize_int8(jnp.asarray(v), block=128)
    out = np.asarray(
        flash_attention_kvquant(
            jnp.asarray(q), kq, vq, config=TileConfig(128, 128),
            out_dtype=jnp.float32,
        )
    )
    # int8's quantization step makes rel-error at |ref|~1e-3 meaningless;
    # measure rel where |ref| > 0.05 (abs tier unchanged at the 1e-2 default)
    check_accuracy(
        out, naive_attention(q, k, v), name="int8-kv attention", rel_floor=0.05
    )


def test_kvquant_rejects_mismatched_blocks():
    q, k, v = make_qkv(1, 1, 256, 64, dtype=np.float32, seed=5)
    kq = quantize_int8(jnp.asarray(k), block=128)
    vq = quantize_int8(jnp.asarray(v), block=64)
    with pytest.raises(ValueError):
        flash_attention_kvquant(jnp.asarray(q), kq, vq)


def test_fp8_slow_path_warning_steering():
    # VERDICT r1 item 10: fp8 KV on a chip without native e4m3 MXU operands
    # must steer the caller toward int8 (once), and stay silent on chips
    # with native fp8 matmuls or for int8 inputs.
    import warnings

    from exploring_flash_attention_tpu.ops import quant

    quant._fp8_warned = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        quant.warn_if_fp8_slow(jnp.int8, device_kind="TPU v5 lite")
        quant.warn_if_fp8_slow(quant.FP8_DTYPE, device_kind="TPU v6e")
        assert not rec
        quant.warn_if_fp8_slow(quant.FP8_DTYPE, device_kind="TPU v5 lite")
        assert len(rec) == 1 and issubclass(
            rec[0].category, quant.Fp8SlowPathWarning)
        assert "quantize_int8" in str(rec[0].message)
        # once per process only
        quant.warn_if_fp8_slow(quant.FP8_DTYPE, device_kind="TPU v5 lite")
        assert len(rec) == 1
    quant._fp8_warned = False
