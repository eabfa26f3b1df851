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
    opt_state_spec,
    param_spec,
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
    mesh=None,
):
    """Returns (train_step(params, opt_state, tokens, rng), optimizer).

    With a mesh: the full step runs inside one shard_map over
    (dp, tp, sp) — dp shards the batch, tp Megatron-shards heads/FFN,
    and sp shards the sequence with bidirectional attention through the
    Ulysses all-to-all (parallel/ulysses.py; heads scatter over sp, each
    shard computes a complete non-causal softmax).  The MLM mask is drawn
    replicated (same rng on every shard) and the masked-CE normalizer is
    the GLOBAL masked count (psum over dp x sp), so the sharded loss
    equals the single-device one."""
    opt = optimizer if optimizer is not None else optax.adamw(learning_rate)
    mtok = config.vocab_size - 1 if mask_token is None else mask_token

    if mesh is None:
        @jax.jit
        def train_step(params, opt_state, tokens, rng):
            loss, grads = jax.value_and_grad(mlm_loss)(
                params, tokens, rng, config, mtok, mask_rate, interpret
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step, opt

    from jax.sharding import PartitionSpec as P

    sp = mesh.shape["sp"]

    def local_step(params, opt_state, inputs, tokens, mask):
        # inputs/tokens/mask: [B/dp, L] (masked OUTSIDE shard_map at the
        # global batch shape so the draws match the single-device step);
        # each sp shard consumes its L/sp slice
        l_local = tokens.shape[1] // sp
        start = jax.lax.axis_index("sp") * l_local
        inputs_l = jax.lax.dynamic_slice_in_dim(inputs, start, l_local, 1)
        tokens_l = jax.lax.dynamic_slice_in_dim(tokens, start, l_local, 1)
        mask_l = jax.lax.dynamic_slice_in_dim(mask, start, l_local, 1)
        denom = jnp.maximum(
            jax.lax.psum(jnp.sum(mask_l), ("dp", "sp")), 1
        ).astype(jnp.float32)

        def local_loss(params):
            logits = forward(params, inputs_l, config, "tp", "sp",
                             interpret, causal=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, tokens_l)
            return jnp.sum(jnp.where(mask_l, ce, 0.0)) / denom

        loss_l, grads = jax.value_and_grad(local_loss)(params)
        # the global loss is a SUM of shard contributions (each already
        # carries the global normalizer)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("dp", "sp")), grads
        )
        loss = jax.lax.psum(loss_l, ("dp", "sp"))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pspec = param_spec(config)
    ospec = opt_state_spec(config, opt)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspec, ospec, P("dp", None), P("dp", None),
                  P("dp", None)),
        out_specs=(pspec, ospec, P()),
        check_vma=False,
    )

    @jax.jit
    def train_step(params, opt_state, tokens, rng):
        inputs, mask = mask_tokens(tokens, rng, mtok, mask_rate)
        return sharded(params, opt_state, inputs, tokens, mask)

    return train_step, opt
