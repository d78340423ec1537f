"""Multi-head attention for the joint encoder.

Two interchangeable paths with identical semantics:

- `mha_reference`: plain XLA einsum attention with an additive bias
  ``(1-mask) * -10000`` — the reference semantics
  (reference: transformers BertSelfAttention via models/cxrbert_origin.py:126-128;
  vendored copy at sc/pytorch_pretrained_bert/model.py:285-320).
- `medvill_tpu.ops.flash_attention.flash_mha`: a Pallas flash-attention kernel
  parameterized by the mask *spec* (never materializing L x L), used on TPU for
  the hot path.

Shapes: q,k,v are [B, L, H, D]; bias is [B, 1, Lq, Lk] additive.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray],
                  *, dropout_rate: float = 0.0,
                  deterministic: bool = True,
                  dropout_rng: Optional[jax.Array] = None,
                  probs_dtype=jnp.float32) -> jnp.ndarray:
    """Naive attention: softmax((qk^T)/sqrt(d) + bias) v.

    Softmax is computed in fp32 regardless of input dtype (the additive
    -10000 bias requires headroom; matches reference fp32/amp behavior).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(probs_dtype), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
