"""Quantization primitives: INT8 / FP8 tensors with per-block scales.

Extension layer over the reference capability surface (BASELINE.json north
star): QKV and the KV-cache are stored quantized, and dequantization is
fused into the attention tile matmuls — the scales fold into scalar
multiplies that the kernels already perform (softmax scale, alpha rescale),
so the quantized path adds no extra passes over the tiles.

Layout contract: a quantized [B, H, L, d] tensor is
    values: int8 / float8_e4m3fn  [B, H, L, d]
    scales: float32               [B, H, n_blocks]   (one scale per
            ``block`` rows of L — symmetric absmax quantization)
matching the kernels' KV-block granularity so each grid step consumes
exactly one scalar scale.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Tuple

import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import cdiv

INT8_MAX = 127.0
# E4M3 max normal value
FP8_MAX = 448.0
FP8_DTYPE = jnp.float8_e4m3fn


@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """Per-L-block symmetric quantized tensor (pytree)."""

    values: jax.Array          # [B, H, L, d] int8 or fp8
    scales: jax.Array          # [B, H, n_blocks] f32
    block: int                 # rows of L per scale

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


jax.tree_util.register_dataclass(
    QuantizedTensor, data_fields=["values", "scales"], meta_fields=["block"]
)


def _absmax_scale(x: jax.Array, block: int, qmax: float) -> jax.Array:
    b, h, l, d = x.shape
    n_blocks = cdiv(l, block)
    pad = n_blocks * block - l
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    xb = x.reshape(b, h, n_blocks, block * d)
    absmax = jnp.max(jnp.abs(xb.astype(jnp.float32)), axis=-1)
    return jnp.maximum(absmax, 1e-8) / qmax


def quantize_int8(x: jax.Array, block: int = 128) -> QuantizedTensor:
    """Symmetric absmax INT8 quantization with one f32 scale per L-block."""
    scales = _absmax_scale(x, block, INT8_MAX)               # [B,H,nb]
    inv = 1.0 / scales
    scaled = x.astype(jnp.float32) * _expand(inv, x.shape, block)
    q = jnp.clip(jnp.round(scaled), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return QuantizedTensor(q, scales, block)


def quantize_fp8(x: jax.Array, block: int = 128) -> QuantizedTensor:
    """Symmetric absmax FP8 (e4m3) quantization with per-L-block scales."""
    scales = _absmax_scale(x, block, FP8_MAX)
    inv = 1.0 / scales
    scaled = x.astype(jnp.float32) * _expand(inv, x.shape, block)
    q = jnp.clip(scaled, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
    return QuantizedTensor(q, scales, block)


class Fp8SlowPathWarning(UserWarning):
    """FP8 KV on a TPU generation without native e4m3 MXU operands."""


_fp8_warned = False


def warn_if_fp8_slow(dtype, device_kind: str | None = None) -> None:
    """Steer callers toward INT8 when handing FP8 KV to a chip whose MXU
    has no native e4m3 operand path (v5e and earlier): the e4m3->bf16 cast
    is software there, measured 67 vs 129 TFLOP/s against the int8 path at
    the d-tiled d=512 tier (bench/results.json: fwd_dtiled_d512_fp8 vs
    fwd_kvquant_int8).  Warns once per process; int8 is bit-exact over the
    same per-block absmax scales, so there is no accuracy argument for fp8
    on these chips (docs/dtiled.md)."""
    global _fp8_warned
    if _fp8_warned or dtype != FP8_DTYPE:
        return
    kind = device_kind
    if kind is None:
        try:
            dev = jax.devices()[0]
            if dev.platform != "tpu":
                return  # CPU interpret-mode runs: nothing to steer
            kind = dev.device_kind
        except Exception:
            return
    kind = kind.lower()
    # native fp8 matmul operands arrive with v6 (Trillium) class chips
    if any(tag in kind for tag in ("v6", "trillium", "7x", "v7")):
        return
    _fp8_warned = True
    warnings.warn(
        f"FP8 (e4m3) KV on '{kind}': this chip has no native fp8 MXU "
        "operand path, so the e4m3->bf16 cast runs in software (~2x slower "
        "than int8: 67 vs 129 TFLOP/s measured at d=512). Use "
        "quantize_int8 instead — same per-block scales, same fused-dequant "
        "kernels, full MXU throughput.",
        Fp8SlowPathWarning,
        stacklevel=3,
    )


def _expand(scales: jax.Array, shape, block: int) -> jax.Array:
    """[B,H,nb] -> broadcastable [B,H,L,1]."""
    b, h, l, _ = shape
    s = jnp.repeat(scales, block, axis=2)[:, :, :l]
    return s[..., None]


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """Reference dequant (NOT the fused path — used by tests/oracles only)."""
    return (
        qt.values.astype(jnp.float32)
        * _expand(qt.scales, qt.values.shape, qt.block)
    ).astype(dtype)


def quantization_error(x: jax.Array, qt: QuantizedTensor) -> float:
    """max-abs round-trip error, for calibration diagnostics."""
    return float(
        jnp.max(jnp.abs(x.astype(jnp.float32) - dequantize(qt)))
    )
