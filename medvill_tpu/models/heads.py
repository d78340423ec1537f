"""Task heads.

- MLMHead: dense+GELU+LayerNorm transform, then a decoder tied to the word
  embedding table plus a free bias (reference:
  models/cxrbert_origin.py:205-248; note the transform LayerNorm uses
  eps=1e-5, unlike the 1e-12 embeddings LN — cxrbert_origin.py:212).
- ITMHead: Linear(hidden -> 2) on the pooled output (reference:
  cxrbert_origin.py:164-173).
- ClfHead: Linear(hidden -> n_classes) (reference:
  Classification/mmbt/models/mmbt.py:105-114).
- VQAHead: Linear(768 -> 768*2) + ReLU + Linear(-> 458)
  (reference: sc/pytorch_pretrained_bert/model.py:940-943).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig


class MLMHead(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, word_embedding: jnp.ndarray,
                 task_idx: jnp.ndarray = None) -> jnp.ndarray:
        cfg = self.config
        relax = getattr(cfg, "relax_projection", 0)
        width = cfg.hidden_size * relax if relax > 1 else cfg.hidden_size
        x = nn.Dense(width,
                     kernel_init=nn.initializers.normal(cfg.initializer_range),
                     dtype=hidden.dtype, name="transform_dense")(hidden)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        # LN emits the compute dtype (f32 stats internally) so the vocab
        # gemm below runs on the MXU in bf16 — a f32 [B·L,768]x[768,V] gemm
        # is ~8x slower and was ~10% of the pretrain step
        x = nn.LayerNorm(epsilon=1e-5, dtype=hidden.dtype,
                         name="transform_LayerNorm")(x)
        if relax > 1:
            # task-specific projection select (reference: model.py:441-443,
            # 480-484): transform emits relax_projection stacked projections;
            # pick the per-sample slice indexed by task_idx (s2s=3, bi=0;
            # sc/data_loader.py:317-319)
            B, L = x.shape[:2]
            x = x.reshape(B, L, relax, cfg.hidden_size)
            if task_idx is None:
                task_idx = jnp.zeros((B,), jnp.int32)
            idx = task_idx.astype(jnp.int32)[:, None, None, None]
            x = jnp.take_along_axis(x, idx, axis=2)[:, :, 0]
        # tied decoder: logits = x @ E^T + b (reference:
        # cxrbert_origin.py:221-238); bf16 operands, f32 accumulation/out
        logits = jnp.einsum("blh,vh->blv", x.astype(hidden.dtype),
                            word_embedding.astype(hidden.dtype),
                            preferred_element_type=jnp.float32)
        bias = self.param("decoder_bias", nn.initializers.zeros,
                          (cfg.vocab_size,), jnp.float32)
        return logits + bias


class ITMHead(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(2, name="linear")(pooled.astype(jnp.float32))


class ClfHead(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.n_classes, name="clf")(pooled.astype(jnp.float32))


class VQAHead(nn.Module):
    hidden_size: int = 768
    n_answers: int = 458

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size * 2, name="fc1")(x.astype(jnp.float32))
        x = nn.relu(x)
        return nn.Dense(self.n_answers, name="fc2")(x)
