"""Bidirectional encoder (masked-LM) on the same stack.

A second model family over the engine: the decoder's transformer blocks
run with ``causal=False`` (bidirectional attention through the NON-causal
one-pass kernel — the headline path), trained with the standard
masked-language-model objective.  The reference has no models at all
(SURVEY §0); this demonstrates the kernels serving the encoder side of
the design space (BERT-style pretraining) with zero new kernel code.

Reuses ``ModelConfig`` / ``init_params`` / ``forward`` from
models/transformer.py; only the objective differs:

    inputs  = tokens with a seeded 15% of positions replaced by [MASK]
    loss    = CE(logits, tokens) averaged over the masked positions only
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    Params,
    forward,
)


def mask_tokens(
    tokens: jax.Array,            # [B, L] int32
    rng: jax.Array,
    mask_token: int,
    mask_rate: float = 0.15,
):
    """Returns (masked_inputs, mask [B, L] bool).  Plain BERT masking
    (all selected positions -> [MASK]; the 80/10/10 refinement is a
    data-pipeline concern, not a model one)."""
    mask = jax.random.bernoulli(rng, mask_rate, tokens.shape)
    return jnp.where(mask, mask_token, tokens), mask


def mlm_loss(
    params: Params,
    tokens: jax.Array,            # [B, L] int32 — the clean sequence
    rng: jax.Array,
    config: ModelConfig,
    mask_token: int,
    mask_rate: float = 0.15,
    interpret: Optional[bool] = None,
) -> jax.Array:
    inputs, mask = mask_tokens(tokens, rng, mask_token, mask_rate)
    logits = forward(params, inputs, config, interpret=interpret,
                     causal=False)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, tokens)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, ce, 0.0)) / denom


def make_mlm_train_step(
    config: ModelConfig,
    mask_token: Optional[int] = None,
    mask_rate: float = 0.15,
    learning_rate: float = 1e-3,
    interpret: Optional[bool] = None,
    optimizer=None,
):
    """Returns (train_step(params, opt_state, tokens, rng), optimizer).

    Single-device / dp-via-jit-sharding; the encoder path does not
    compose with sequence parallelism (bidirectional attention would
    need a non-causal ring — the causal decoder owns that tier)."""
    opt = optimizer if optimizer is not None else optax.adamw(learning_rate)
    mtok = config.vocab_size - 1 if mask_token is None else mask_token

    @jax.jit
    def train_step(params, opt_state, tokens, rng):
        loss, grads = jax.value_and_grad(mlm_loss)(
            params, tokens, rng, config, mtok, mask_rate, interpret
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, opt
