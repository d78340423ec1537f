"""BERT encoder stack in Flax (post-LN, HF-compatible parameterization).

Mirrors the semantics of the HF ``transformers.modeling_bert.BertModel`` used
by the pretrain/classification/retrieval paths (reference:
models/cxrbert_origin.py:8-10) and the vendored copy used by finetune/decode
(reference: sc/pytorch_pretrained_bert/model.py:202-433).  Submodule names
follow the torch parameter tree so checkpoint import is a mechanical remap.

TPU notes:
- attention runs through `medvill_tpu.ops` so the Pallas flash kernel can be
  swapped in; the additive-bias reference path is the fallback and oracle.
- all matmuls run in ``config.compute_dtype`` (bf16 on TPU); LayerNorm and
  softmax accumulate in fp32.
- the encoder exposes an incremental path with a true K/V cache for
  autoregressive decode; the reference instead caches per-layer *hidden
  states* and recomputes K/V over ``cat(history, new)`` (reference:
  sc/pytorch_pretrained_bert/model.py:285-294) — mathematically identical
  since K/V are per-position linear maps (equivalence tested in
  tests/test_decode_equivalence.py).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig
from medvill_tpu.ops.attention import mha_reference


def _dtype(cfg: BertConfig):
    return jnp.dtype(cfg.compute_dtype)


class _FastDropout(nn.Module):
    """Integer-threshold Bernoulli dropout (``BertConfig.fast_dropout``):
    keep a unit iff its raw uint32 PRNG bits >= floor(rate * 2^32) — the
    identical Bernoulli(rate) marginal as ``random.bernoulli`` minus the
    bits->float conversion the VPU otherwise pays per element."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, "uint32")
        thresh = jnp.uint32(round(self.rate * 2 ** 32))
        return jnp.where(bits >= thresh, x * (1.0 / (1.0 - self.rate)),
                         0).astype(x.dtype)


def _make_dropout(cfg: BertConfig, rate: float):
    return _FastDropout(rate) if cfg.fast_dropout else nn.Dropout(rate)


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings -> LayerNorm -> dropout.

    When ``position_ids`` is None uses ``arange(L)`` like HF — note the
    reference embeds [CLS]/[SEP] by separate 1-token calls so they all get
    position 0 (reference: models/cxrbert_origin.py:115-119).
    """

    config: BertConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        embedding_init=init, name="word_embeddings")
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size,
                                            embedding_init=init,
                                            name="position_embeddings")
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size,
                                              cfg.hidden_size,
                                              embedding_init=init,
                                              name="token_type_embeddings")
        # bf16 in/out with f32 statistics (flax _compute_stats forces
        # float32 reductions) — keeps LN off the HBM-bandwidth critical path
        self.LayerNorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                      dtype=_dtype(cfg), name="LayerNorm")
        self.dropout = _make_dropout(cfg, cfg.hidden_dropout_prob)

    def __call__(self, input_ids: jnp.ndarray,
                 token_type_ids: Optional[jnp.ndarray] = None,
                 position_ids: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B, L = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                            (B, L))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), dtype=jnp.int32)
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        x = self.LayerNorm(x)
        x = self.dropout(x, deterministic=deterministic)
        return x.astype(_dtype(self.config))

    def embed_projected(self, vectors: jnp.ndarray,
                        position_ids: jnp.ndarray,
                        token_type_ids: jnp.ndarray,
                        projected: jnp.ndarray,
                        deterministic: bool = True) -> jnp.ndarray:
        """Shared-table path for image embeddings: caller supplies the
        projected vectors; we add pos/type embeddings + LN + dropout
        (reference: ImageBertEmbeddings, models/cxrbert_origin.py:12-35)."""
        del vectors
        x = (projected
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        x = self.LayerNorm(x)
        x = self.dropout(x, deterministic=deterministic)
        return x.astype(_dtype(self.config))


class BertSelfAttention(nn.Module):
    config: BertConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        if getattr(cfg, "fused_qkv", False):
            # fused QKV held as ONE [H, 3H] parameter (single gemm, no
            # per-step weight concat).  Measured SLOWER than three separate
            # [H, H] dots at the flagship config even in this native-param
            # form (321.7 vs 351.5 pairs/s; the round-2 runtime-concat
            # variant was also -5%) — XLA overlaps/fuses the three small
            # gemms better than one wide one here, so the default stays
            # False; kept as an honest A/B knob.  Checkpoint import fuses
            # torch query/key/value on load
            # (checkpoint.load_hf_bert_into_joint).
            self.qkv = nn.Dense(3 * cfg.hidden_size, kernel_init=init,
                                dtype=_dtype(cfg), name="qkv")
        else:
            dense = lambda name: nn.Dense(cfg.hidden_size, kernel_init=init,
                                          dtype=_dtype(cfg), name=name)
            self.query = dense("query")
            self.key = dense("key")
            self.value = dense("value")
        self.dropout = nn.Dropout(cfg.attention_probs_dropout_prob)

    def project(self, hidden: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = self.config
        B, L, _ = hidden.shape
        shape = (B, L, cfg.num_attention_heads, cfg.head_dim)
        if not getattr(cfg, "fused_qkv", False):
            q = self.query(hidden).reshape(shape)
            k = self.key(hidden).reshape(shape)
            v = self.value(hidden).reshape(shape)
            return q, k, v
        H = cfg.hidden_size
        qkv = self.qkv(hidden)
        return (qkv[..., :H].reshape(shape),
                qkv[..., H:2 * H].reshape(shape),
                qkv[..., 2 * H:].reshape(shape))

    def __call__(self, hidden: jnp.ndarray, bias: Optional[jnp.ndarray],
                 deterministic: bool = True,
                 attention_fn: Any = None,
                 kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 cache_index: Optional[jnp.ndarray] = None):
        """Returns (context [B,L,hid], new_kv_cache or None)."""
        cfg = self.config
        q, k, v = self.project(hidden)
        new_cache = None
        if kv_cache is not None:
            # incremental decode: write new K/V at [cache_index, ...) and
            # attend over the full cache (masked by bias)
            ck, cv = kv_cache
            Lnew = k.shape[1]
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
        dropout_rng = None
        if not deterministic and cfg.attention_probs_dropout_prob > 0.0:
            dropout_rng = self.make_rng("dropout")
        if attention_fn is None:
            ctx = mha_reference(
                q, k, v, bias,
                dropout_rate=cfg.attention_probs_dropout_prob,
                deterministic=deterministic, dropout_rng=dropout_rng)
        else:
            ctx = attention_fn(q, k, v, bias, dropout_rng=dropout_rng,
                               deterministic=deterministic)
        B, L = hidden.shape[:2]
        return ctx.reshape(B, L, cfg.hidden_size), new_cache


class FusedDropAddLN(nn.Module):
    """(dropout + residual-add + LayerNorm) as ONE Pallas kernel
    (``ops/fused_ln.py``), selected by ``BertConfig.fused_ln``.  Parameter
    names (scale/bias) and shapes match ``nn.LayerNorm`` exactly, so
    checkpoints are interchangeable with the unfused stack."""
    config: BertConfig
    rate: float

    @nn.compact
    def __call__(self, x, res, deterministic=True):
        from medvill_tpu.ops.fused_ln import fused_dropout_add_ln

        cfg = self.config
        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (h,))
        bias = self.param("bias", nn.initializers.zeros, (h,))
        rate = 0.0 if deterministic else float(self.rate)
        if rate > 0.0:
            seed = jax.random.bits(self.make_rng("dropout"), (),
                                   jnp.uint32).astype(jnp.int32)
        else:
            seed = jnp.int32(0)
        y = fused_dropout_add_ln(x, res, scale, bias, rate=rate,
                                 eps=cfg.layer_norm_eps, seed=seed)
        return y.astype(_dtype(cfg))


class BertSelfOutput(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, ctx, residual, deterministic=True):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size,
                     kernel_init=nn.initializers.normal(cfg.initializer_range),
                     dtype=_dtype(cfg), name="dense")(ctx)
        if cfg.fused_ln:
            return FusedDropAddLN(cfg, cfg.hidden_dropout_prob,
                                  name="LayerNorm")(
                x, residual, deterministic=deterministic)
        x = _make_dropout(cfg, cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=_dtype(cfg),
                         name="LayerNorm")(x + residual)
        return x.astype(_dtype(cfg))


class BertLayer(nn.Module):
    config: BertConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        self.self_attention = BertSelfAttention(cfg, name="self")
        self.attention_output = BertSelfOutput(cfg, name="attention_output")
        self.intermediate = nn.Dense(cfg.intermediate_size, kernel_init=init,
                                     dtype=_dtype(cfg), name="intermediate")
        self.output_dense = nn.Dense(cfg.hidden_size, kernel_init=init,
                                     dtype=_dtype(cfg), name="output_dense")
        if cfg.fused_ln:
            self.output_fused = FusedDropAddLN(cfg, cfg.hidden_dropout_prob,
                                               name="output_LayerNorm")
        else:
            self.output_dropout = _make_dropout(cfg,
                                                cfg.hidden_dropout_prob)
            self.output_LayerNorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                                 dtype=_dtype(cfg),
                                                 name="output_LayerNorm")

    def ffn(self, attn_out, deterministic=True):
        inter = self.intermediate(attn_out)
        # exact erf-GELU (reference: cxrbert_origin.py:176-181 /
        # sc/pytorch_pretrained_bert/model.py gelu) in the compute dtype:
        # an f32 upcast here materializes the [B·L, 4H] intermediate in f32
        # and blocks fusion into the gemm epilogue (the reference ran this
        # in fp16 under apex AMP, finetune.py:297-301)
        inter = jax.nn.gelu(inter, approximate=False)
        out = self.output_dense(inter)
        if self.config.fused_ln:
            return self.output_fused(out, attn_out,
                                     deterministic=deterministic)
        out = self.output_dropout(out, deterministic=deterministic)
        return self.output_LayerNorm(out + attn_out).astype(
            _dtype(self.config))

    def __call__(self, hidden, bias, deterministic=True, attention_fn=None,
                 kv_cache=None, cache_index=None, remat_ffn=False):
        ctx, new_cache = self.self_attention(
            hidden, bias, deterministic=deterministic,
            attention_fn=attention_fn, kv_cache=kv_cache,
            cache_index=cache_index)
        attn_out = self.attention_output(ctx, hidden,
                                         deterministic=deterministic)
        if remat_ffn:
            # checkpoint only the FFN: its [B, L, 4H] intermediates dominate
            # activation memory, while attention + QKV/output gemms stay
            # stored (not recomputed in the backward)
            out = nn.remat(
                lambda mdl, x: mdl.ffn(x, deterministic=deterministic)
            )(self, attn_out)
        else:
            out = self.ffn(attn_out, deterministic=deterministic)
        return out, new_cache


class BertEncoder(nn.Module):
    """Stack of BertLayers.

    Layers are distinct parameter sets (not scanned) to match the reference
    topology 1:1; at 12 layers compile time is fine and XLA still fuses per
    layer.  ``remat=True`` checkpoints each layer (activations rematerialized
    in backward — trades ~30% encoder FLOPs for O(1/num_layers) activation
    memory, unlocking larger batches).
    """

    config: BertConfig
    remat: bool = False

    def setup(self):
        self.layers = [BertLayer(self.config, name=f"layer_{i}")
                       for i in range(self.config.num_hidden_layers)]

    def __call__(self, hidden, bias, deterministic=True, attention_fn=None,
                 kv_caches=None, cache_index=None):
        new_caches = [] if kv_caches is not None else None
        use_remat = self.remat and kv_caches is None and not deterministic
        mode = getattr(self.config, "remat_mode", "layer")
        for i, layer in enumerate(self.layers):
            cache = kv_caches[i] if kv_caches is not None else None
            if use_remat and mode == "layer":
                def run(mdl, h, b):
                    return mdl(h, b, deterministic=deterministic,
                               attention_fn=attention_fn)[0]

                hidden = nn.remat(run)(layer, hidden, bias)
                new_cache = None
            else:
                hidden, new_cache = layer(
                    hidden, bias, deterministic=deterministic,
                    attention_fn=attention_fn, kv_cache=cache,
                    cache_index=cache_index,
                    remat_ffn=use_remat and mode == "ffn")
            if new_caches is not None:
                new_caches.append(new_cache)
        return hidden, new_caches


class BertPooler(nn.Module):
    """dense+tanh over position 0 (reference: HF BertPooler)."""

    config: BertConfig

    @nn.compact
    def __call__(self, hidden):
        x = nn.Dense(self.config.hidden_size,
                     kernel_init=nn.initializers.normal(
                         self.config.initializer_range),
                     dtype=_dtype(self.config), name="dense")(hidden[:, 0])
        return jnp.tanh(x.astype(jnp.float32)).astype(_dtype(self.config))
