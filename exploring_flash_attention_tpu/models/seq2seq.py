"""Encoder-decoder (seq2seq) model family: cross-attention on the engine.

Third model family over the same kernels.  The reference repo has no model
stack at all (SURVEY §0: "no training loop, no model code"), but its V1
oracle and kernels are explicitly cross-length capable in this build
(oracle/reference.py handles Lq != Lkv; ops/attention_v1.py takes separate
q/kv lengths) — this family is what that capability exists FOR:

    encoder  : bidirectional self-attention over the source (causal=False
               through the headline non-causal one-pass kernel)
    decoder  : causal self-attention over the target, then CROSS-attention
               (decoder queries against encoder memory — Lq=L_tgt,
               Lkv=L_src, non-causal) through the same Pallas forward +
               custom-VJP backward as every other attention in the repo.

Design choices (T5-style where the reference is silent):
- RoPE rotates self-attention q/k at their own positions; cross-attention
  is position-free (relative positions between target and source tokens
  are not meaningful — T5/Whisper convention).
- Separate encoder/decoder parameter stacks, shared source/target
  embedding table (tied softmax, like the decoder-only family).
- Teacher-forcing CE loss over the target sequence.

Everything is differentiable end-to-end: the cross-attention backward is
the same tiled Pallas kernel pair (ops/attention_bwd.py) the causal path
uses, just without the causal pruning.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    _mlp_block,
    _rmsnorm,
    rope,
)
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    """One config drives both stacks; n_enc_layers/n_dec_layers split the
    depth.  Reuses ModelConfig's validated fields for the shared shape
    knobs (heads, dims, tile geometry)."""
    base: ModelConfig = ModelConfig()
    n_enc_layers: int = 2
    n_dec_layers: int = 2

    def __post_init__(self):
        if self.base.window is not None:
            raise ValueError("seq2seq does not support sliding windows")


def _dense(rng, c: ModelConfig, *shape):
    std = 1.0 / np.sqrt(shape[0])
    return jnp.asarray(rng.normal(0.0, std, shape), dtype=c.dtype)


def _attn_params(rng, c: ModelConfig):
    return {
        "wq": _dense(rng, c, c.d_model, c.n_heads, c.d_head),
        "wk": _dense(rng, c, c.d_model, c.n_kv_heads, c.d_head),
        "wv": _dense(rng, c, c.d_model, c.n_kv_heads, c.d_head),
        "wo": _dense(rng, c, c.n_heads * c.d_head, c.d_model).reshape(
            c.n_heads, c.d_head, c.d_model),
    }


def _mlp_params(rng, c: ModelConfig):
    return {
        "ln2": jnp.ones((c.d_model,), c.dtype),
        "w_gate": _dense(rng, c, c.d_model, c.d_ff),
        "w_up": _dense(rng, c, c.d_model, c.d_ff),
        "w_down": _dense(rng, c, c.d_ff, c.d_model),
    }


def init_seq2seq_params(config: Seq2SeqConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    c = config.base
    enc_layers = []
    for _ in range(config.n_enc_layers):
        enc_layers.append({
            "ln1": jnp.ones((c.d_model,), c.dtype),
            **_attn_params(rng, c),
            **_mlp_params(rng, c),
        })
    dec_layers = []
    for _ in range(config.n_dec_layers):
        dec_layers.append({
            "ln1": jnp.ones((c.d_model,), c.dtype),
            **_attn_params(rng, c),
            "ln_x": jnp.ones((c.d_model,), c.dtype),
            "cross": _attn_params(rng, c),
            **_mlp_params(rng, c),
        })
    return {
        "embed": jnp.asarray(
            rng.normal(0.0, 0.02, (c.vocab_size, c.d_model)), dtype=c.dtype
        ),
        "ln_enc": jnp.ones((c.d_model,), c.dtype),
        "ln_f": jnp.ones((c.d_model,), c.dtype),
        "enc_layers": enc_layers,
        "dec_layers": dec_layers,
    }


def _qkv(p, h, c: ModelConfig, kv_src=None):
    """Project h -> q and (kv_src or h) -> k, v as [B, H, L, d]."""
    kv_in = h if kv_src is None else kv_src
    q = jnp.einsum("ble,ehd->bhld", h, p["wq"])
    k = jnp.einsum("ble,ehd->bhld", kv_in, p["wk"])
    v = jnp.einsum("ble,ehd->bhld", kv_in, p["wv"])
    return q, k, v


def _self_attn(p, x, c: ModelConfig, causal: bool, interpret):
    h = _rmsnorm(x, p["ln1"], c.norm_eps)
    q, k, v = _qkv(p, h, c)
    if c.use_rope:
        pos = jnp.arange(x.shape[1], dtype=jnp.int32)
        q = rope(q, pos, c.rope_theta)
        k = rope(k, pos, c.rope_theta)
    o = flash_attention(q, k, v, config=c.tile, causal=causal,
                        interpret=interpret)
    return jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["wo"])


def _cross_attn(p, x, memory, c: ModelConfig, interpret):
    """Decoder queries against encoder memory: Lq=L_tgt, Lkv=L_src,
    non-causal, position-free (T5 convention)."""
    h = _rmsnorm(x, p["ln_x"], c.norm_eps)
    q, k, v = _qkv(p["cross"], h, c, kv_src=memory)
    o = flash_attention(q, k, v, config=c.tile, causal=False,
                        interpret=interpret)
    return jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["cross"]["wo"])


def encode(
    params: Params,
    src_tokens: jax.Array,          # [B, L_src] int32
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Encoder memory [B, L_src, E] — bidirectional self-attention."""
    c = config.base
    x = params["embed"][src_tokens].astype(c.dtype)
    for p in params["enc_layers"]:
        x = x + _self_attn(p, x, c, causal=False, interpret=interpret)
        x = x + _mlp_block(p, x, c, None)
    return _rmsnorm(x, params["ln_enc"], c.norm_eps)


def decode(
    params: Params,
    tgt_tokens: jax.Array,          # [B, L_tgt] int32
    memory: jax.Array,              # [B, L_src, E]
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Decoder logits [B, L_tgt, V]: causal self-attn + cross-attn + MLP."""
    c = config.base
    x = params["embed"][tgt_tokens].astype(c.dtype)
    for p in params["dec_layers"]:
        x = x + _self_attn(p, x, c, causal=True, interpret=interpret)
        x = x + _cross_attn(p, x, memory, c, interpret=interpret)
        x = x + _mlp_block(p, x, c, None)
    x = _rmsnorm(x, params["ln_f"], c.norm_eps)
    return jnp.einsum(
        "ble,ve->blv", x, params["embed"].astype(c.dtype)
    ).astype(jnp.float32)


def seq2seq_forward(
    params: Params,
    src_tokens: jax.Array,
    tgt_tokens: jax.Array,
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    memory = encode(params, src_tokens, config, interpret)
    return decode(params, tgt_tokens, memory, config, interpret)


def seq2seq_loss(
    params: Params,
    src_tokens: jax.Array,          # [B, L_src]
    tgt_tokens: jax.Array,          # [B, L_tgt + 1] (shifted internally)
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Teacher-forcing CE: predict tgt[t+1] from tgt[:t+1] and the source."""
    logits = seq2seq_forward(
        params, src_tokens, tgt_tokens[:, :-1], config, interpret
    )
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, tgt_tokens[:, 1:]
    )
    return jnp.mean(ce)


def make_seq2seq_train_step(
    config: Seq2SeqConfig,
    learning_rate: float = 3e-3,
    interpret: Optional[bool] = None,
):
    """(step, optimizer): step(params, opt_state, src, tgt) -> (params,
    opt_state, loss), fully jitted. Single-device; the sharded-training
    story lives in the decoder-only flagship (models/transformer.py)."""
    opt = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state, src, tgt):
        loss, grads = jax.value_and_grad(seq2seq_loss)(
            params, src, tgt, config, interpret
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, opt
