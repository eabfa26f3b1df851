"""d-tiled V1 Pallas kernel vs oracle and the non-tiled V1 kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.ops import (
    flash_attention_v1,
    flash_attention_v1_dtiled,
)


def run_dtiled(q, k, v, **kw):
    return np.asarray(
        flash_attention_v1_dtiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kw
        )
    )


@pytest.mark.parametrize("d,dtq,dtv", [(256, 128, 128), (256, 128, 256), (512, 128, 128)])
def test_dtiled_matches_oracle(d, dtq, dtv):
    q, k, v = make_qkv(1, 2, 256, d, dtype=np.float32, seed=0)
    cfg = TileConfig(block_q=128, block_kv=128, d_tile_qk=dtq, d_tile_v=dtv)
    out = run_dtiled(q, k, v, config=cfg)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_dtiled_equals_v1():
    q, k, v = make_qkv(1, 1, 256, 256, dtype=np.float32, seed=1)
    cfg = TileConfig(block_q=128, block_kv=128, d_tile_qk=128, d_tile_v=128)
    a = run_dtiled(q, k, v, config=cfg)
    b = np.asarray(
        flash_attention_v1(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            config=TileConfig(block_q=128, block_kv=128),
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_dtiled_bf16_d512():
    q, k, v = make_qkv(1, 2, 256, 512, dtype=np.float32, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16).astype(np.float32) for x in (q, k, v))
    cfg = TileConfig(block_q=128, block_kv=128, d_tile_qk=128, d_tile_v=128)
    out = run_dtiled(
        qb.astype(jnp.bfloat16), kb.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
        config=cfg, out_dtype=jnp.float32,
    )
    assert error_stats(out, naive_attention(qb, kb, vb))["max_abs"] < 2e-2


def test_dtiled_rejects_bad_shapes():
    q, k, v = make_qkv(1, 1, 250, 256, dtype=np.float32, seed=3)
    cfg = TileConfig(block_q=128, block_kv=128, d_tile_qk=128, d_tile_v=128)
    with pytest.raises(ValueError):
        run_dtiled(q, k, v, config=cfg)
    q, k, v = make_qkv(1, 1, 256, 192, dtype=np.float32, seed=3)
    with pytest.raises(ValueError):
        run_dtiled(q, k, v, config=cfg)


@pytest.mark.parametrize("quantizer", ["int8", "fp8"])
def test_dtiled_quantized_kv(quantizer):
    # BASELINE tier: d-tiled V1 with FP8/INT8 weight-only (KV) QKV —
    # fused dequant must match attention over the dequantized tensors
    from exploring_flash_attention_tpu.ops.quant import (
        dequantize, quantize_fp8, quantize_int8,
    )

    quant = quantize_int8 if quantizer == "int8" else quantize_fp8
    q, k, v = make_qkv(1, 2, 256, 256, dtype=np.float32, seed=4)
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    cfg = TileConfig(block_q=128, block_kv=128, d_tile_qk=128, d_tile_v=128)
    kq = quant(jnp.asarray(k).astype(jnp.bfloat16), block=128)
    vq = quant(jnp.asarray(v).astype(jnp.bfloat16), block=128)
    out = np.asarray(flash_attention_v1_dtiled(
        qb, kq, vq, config=cfg, out_dtype=jnp.float32))
    ref = naive_attention(
        np.asarray(qb.astype(jnp.float32)),
        np.asarray(dequantize(kq).astype(jnp.float32)),
        np.asarray(dequantize(vq).astype(jnp.float32)),
    )
    assert error_stats(out, ref)["max_abs"] < 2e-3


def test_dtiled_quantized_rejects_mismatched_block():
    from exploring_flash_attention_tpu.ops.quant import quantize_int8

    q, k, v = make_qkv(1, 1, 256, 256, dtype=np.float32, seed=5)
    cfg = TileConfig(block_q=128, block_kv=128, d_tile_qk=128, d_tile_v=128)
    kq = quantize_int8(jnp.asarray(k), block=64)     # != block_kv
    vq = quantize_int8(jnp.asarray(v), block=64)
    with pytest.raises(ValueError, match="quant block"):
        flash_attention_v1_dtiled(jnp.asarray(q), kq, vq, config=cfg)
