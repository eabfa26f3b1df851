"""Fully-int8 QKV kernel vs the dequantized oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.ops.attention_int8 import (
    flash_attention_int8,
)
from exploring_flash_attention_tpu.ops.quant import dequantize, quantize_int8


def _setup(b, h, lq, lkv, d, bq, bk, seed=0):
    q, k, v = make_qkv(b, h, max(lq, lkv), d, dtype=np.float32, seed=seed)
    q = jnp.asarray(q[:, :, :lq])
    k = jnp.asarray(k[:, :, :lkv])
    v = jnp.asarray(v[:, :, :lkv])
    qq = quantize_int8(q, block=bq)
    kq = quantize_int8(k, block=bk)
    vq = quantize_int8(v, block=bk)
    ref = naive_attention(
        np.asarray(dequantize(qq)), np.asarray(dequantize(kq)),
        np.asarray(dequantize(vq)),
    )
    return qq, kq, vq, ref


def test_int8_qk_bf16_pv_matches_dequant_oracle():
    # default mode: int8 S matmul is exact integer arithmetic, PV in bf16
    qq, kq, vq, ref = _setup(1, 2, 256, 256, 64, bq=128, bk=128)
    out = flash_attention_int8(
        qq, kq, vq, config=TileConfig(block_q=128, block_kv=128),
        out_dtype=jnp.float32,
    )
    err = error_stats(np.asarray(out), ref)
    assert err["max_abs"] < 1.5e-3, err


def test_int8_full_matches_dequant_oracle_loose():
    # full-int8 mode: P re-quantization adds ~1/254 absolute weight error
    qq, kq, vq, ref = _setup(1, 2, 256, 256, 64, bq=128, bk=128)
    out = flash_attention_int8(
        qq, kq, vq, config=TileConfig(block_q=128, block_kv=128),
        out_dtype=jnp.float32, pv_mode="int8",
    )
    err = error_stats(np.asarray(out), ref)
    assert err["max_abs"] < 3e-2, err


def test_int8_ragged_kv():
    qq, kq, vq, ref = _setup(1, 1, 128, 200, 64, bq=128, bk=128)
    out = flash_attention_int8(
        qq, kq, vq, config=TileConfig(block_q=128, block_kv=128),
        out_dtype=jnp.float32,
    )
    assert error_stats(np.asarray(out), ref)["max_abs"] < 1e-2


def test_int8_block_contract_enforced():
    qq, kq, vq, _ = _setup(1, 1, 256, 256, 64, bq=128, bk=128)
    with pytest.raises(ValueError, match="block"):
        flash_attention_int8(
            qq, kq, vq, config=TileConfig(block_q=256, block_kv=128)
        )
