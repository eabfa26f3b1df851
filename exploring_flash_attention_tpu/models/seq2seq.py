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
from exploring_flash_attention_tpu.models.parallel_layers import (
    f_tp,
    g_tp,
    gather_seq,
)
from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    _mlp_block,
    _rmsnorm,
    rope,
)
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention
from exploring_flash_attention_tpu.parallel.ring import ring_flash_attention
from exploring_flash_attention_tpu.parallel.ulysses import (
    ulysses_flash_attention,
)

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


def _sp_attention(q, k, v, c: ModelConfig, causal, sp_axis, interpret):
    """Attention dispatch for (possibly) sequence-sharded q/kv: ring for
    causal shards, Ulysses all-to-all for bidirectional / cross-length
    shards (all-gather fallback when the local head count can't split)."""
    if sp_axis is None:
        return flash_attention(q, k, v, config=c.tile, causal=causal,
                               interpret=interpret)
    if causal:
        return ring_flash_attention(
            q, k, v, sp_axis, c.tile, None, True, interpret)
    sp_size = jax.lax.axis_size(sp_axis)
    if q.shape[1] % sp_size == 0 and k.shape[1] % sp_size == 0:
        return ulysses_flash_attention(
            q, k, v, sp_axis, c.tile, None, False, interpret)
    kg = gather_seq(k, sp_axis, 2)
    vg = gather_seq(v, sp_axis, 2)
    return flash_attention(q, kg, vg, config=c.tile, causal=False,
                           interpret=interpret)


def _self_attn(p, x, c: ModelConfig, causal: bool, interpret,
               tp_axis=None, sp_axis=None):
    h = _rmsnorm(x, p["ln1"], c.norm_eps)
    if tp_axis is not None:
        h = f_tp(h, tp_axis)          # norm grad needs the tp-summed cotangent
    q, k, v = _qkv(p, h, c)
    if c.use_rope:
        pos0 = (jax.lax.axis_index(sp_axis) * x.shape[1]
                if sp_axis is not None else 0)
        pos = pos0 + jnp.arange(x.shape[1], dtype=jnp.int32)
        q = rope(q, pos, c.rope_theta)
        k = rope(k, pos, c.rope_theta)
    o = _sp_attention(q, k, v, c, causal, sp_axis, interpret)
    out = jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["wo"])
    return g_tp(out, tp_axis) if tp_axis is not None else out


def _cross_attn(p, x, memory, c: ModelConfig, interpret,
                tp_axis=None, sp_axis=None):
    """Decoder queries against encoder memory: Lq=L_tgt, Lkv=L_src,
    non-causal, position-free (T5 convention).  Under sp the target and
    source carry independent shardings — Ulysses gathers each side's own
    length."""
    h = _rmsnorm(x, p["ln_x"], c.norm_eps)
    if tp_axis is not None:
        h = f_tp(h, tp_axis)
        memory = f_tp(memory, tp_axis)
    q, k, v = _qkv(p["cross"], h, c, kv_src=memory)
    o = _sp_attention(q, k, v, c, False, sp_axis, interpret)
    out = jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["cross"]["wo"])
    return g_tp(out, tp_axis) if tp_axis is not None else out


def encode(
    params: Params,
    src_tokens: jax.Array,          # [B, L_src] int32
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
) -> jax.Array:
    """Encoder memory [B, L_src, E] — bidirectional self-attention."""
    c = config.base
    x = params["embed"][src_tokens].astype(c.dtype)
    for p in params["enc_layers"]:
        x = x + _self_attn(p, x, c, causal=False, interpret=interpret,
                           tp_axis=tp_axis, sp_axis=sp_axis)
        x = x + _mlp_block(p, x, c, tp_axis)
    return _rmsnorm(x, params["ln_enc"], c.norm_eps)


def decode(
    params: Params,
    tgt_tokens: jax.Array,          # [B, L_tgt] int32
    memory: jax.Array,              # [B, L_src, E]
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
) -> jax.Array:
    """Decoder logits [B, L_tgt, V]: causal self-attn + cross-attn + MLP."""
    c = config.base
    x = params["embed"][tgt_tokens].astype(c.dtype)
    for p in params["dec_layers"]:
        x = x + _self_attn(p, x, c, causal=True, interpret=interpret,
                           tp_axis=tp_axis, sp_axis=sp_axis)
        x = x + _cross_attn(p, x, memory, c, interpret=interpret,
                            tp_axis=tp_axis, sp_axis=sp_axis)
        x = x + _mlp_block(p, x, c, tp_axis)
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
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
) -> jax.Array:
    memory = encode(params, src_tokens, config, interpret, tp_axis, sp_axis)
    return decode(params, tgt_tokens, memory, config, interpret,
                  tp_axis, sp_axis)


def seq2seq_loss(
    params: Params,
    src_tokens: jax.Array,          # [B, L_src]
    tgt_tokens: jax.Array,          # [B, L_tgt + 1] (shifted internally)
    config: Seq2SeqConfig,
    interpret: Optional[bool] = None,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
) -> jax.Array:
    """Teacher-forcing CE: predict tgt[t+1] from tgt[:t+1] and the source."""
    logits = seq2seq_forward(
        params, src_tokens, tgt_tokens[:, :-1], config, interpret,
        tp_axis, sp_axis,
    )
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, tgt_tokens[:, 1:]
    )
    return jnp.mean(ce)


def seq2seq_param_spec(config: Seq2SeqConfig) -> Params:
    """PartitionSpecs mirroring transformer.param_spec: heads/FFN columns
    Megatron-sharded over tp, norms and embeddings replicated."""
    from jax.sharding import PartitionSpec as P

    attn = {
        "wq": P(None, "tp", None),
        "wk": P(None, "tp", None),
        "wv": P(None, "tp", None),
        "wo": P("tp", None, None),
    }
    mlp = {
        "ln2": P(),
        "w_gate": P(None, "tp"),
        "w_up": P(None, "tp"),
        "w_down": P("tp", None),
    }
    enc_layer = {"ln1": P(), **attn, **mlp}
    dec_layer = {
        "ln1": P(), **attn,
        "ln_x": P(), "cross": dict(attn),
        **mlp,
    }
    return {
        "embed": P(),
        "ln_enc": P(),
        "ln_f": P(),
        "enc_layers": [dict(enc_layer) for _ in range(config.n_enc_layers)],
        "dec_layers": [dict(dec_layer) for _ in range(config.n_dec_layers)],
    }


def make_seq2seq_train_step(
    config: Seq2SeqConfig,
    learning_rate: float = 3e-3,
    interpret: Optional[bool] = None,
    optimizer=None,
    mesh=None,
):
    """(step, optimizer): step(params, opt_state, src, tgt) -> (params,
    opt_state, loss), fully jitted.

    With a mesh: the full step runs inside one shard_map over (dp, tp,
    sp) — dp shards the batch, tp Megatron-shards every attention/FFN,
    and sp shards BOTH the source and target sequences (ring attention
    for the causal decoder self-attention, Ulysses all-to-all for the
    bidirectional encoder and the cross-attention)."""
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    if mesh is None:
        @jax.jit
        def step(params, opt_state, src, tgt):
            loss, grads = jax.value_and_grad(seq2seq_loss)(
                params, src, tgt, config, interpret
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step, opt

    from jax.sharding import PartitionSpec as P

    from exploring_flash_attention_tpu.models.transformer import (
        opt_state_spec_from,
    )

    sp = mesh.shape["sp"]

    def local_step(params, opt_state, src, tgt):
        # src: [B/dp, L_src], tgt: [B/dp, L_tgt + 1] (replicated over
        # tp/sp); each sp shard consumes its slice of both sequences
        sp_idx = jax.lax.axis_index("sp")
        ls_local = src.shape[1] // sp
        lt_local = (tgt.shape[1] - 1) // sp
        src_l = jax.lax.dynamic_slice_in_dim(
            src, sp_idx * ls_local, ls_local, 1)
        tgt_in = jax.lax.dynamic_slice_in_dim(
            tgt, sp_idx * lt_local, lt_local, 1)
        tgt_out = jax.lax.dynamic_slice_in_dim(
            tgt, sp_idx * lt_local + 1, lt_local, 1)

        def local_loss(params):
            logits = decode(
                params, tgt_in,
                encode(params, src_l, config, interpret, "tp", "sp"),
                config, interpret, "tp", "sp",
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt_out)
            return jnp.mean(ce)

        loss, grads = jax.value_and_grad(local_loss)(params)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, ("dp", "sp")), grads)
        loss = jax.lax.pmean(loss, ("dp", "sp"))
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    pspec = seq2seq_param_spec(config)
    params_shape = jax.eval_shape(lambda: init_seq2seq_params(config))
    ospec = opt_state_spec_from(pspec, params_shape, opt)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspec, ospec, P("dp", None), P("dp", None)),
        out_specs=(pspec, ospec, P()),
        check_vma=False,
    )
    return jax.jit(sharded), opt


def shard_seq2seq_params(params: Params, mesh, config: Seq2SeqConfig):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = seq2seq_param_spec(config)
    p_leaves, treedef = jax.tree.flatten(params)
    s_leaves = jax.tree.flatten(spec, is_leaf=lambda s: isinstance(s, P))[0]
    placed = [
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(p_leaves, s_leaves)
    ]
    return jax.tree.unflatten(treedef, placed)
