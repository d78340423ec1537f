"""CXRBERT: joint encoder + MLM (tied) + ITM heads.

Equivalent of ``CXRBERT`` (reference: models/cxrbert_origin.py:132-149):
forward returns ``(mlm_logits [B,L,V], itm_logits [B,2])``.  MLM logits are
computed over the full joint sequence like the reference (the trainer's
CrossEntropyLoss ignores -100 labels); a gather-based variant is available in
the train step for speed.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig
from medvill_tpu.models.heads import ITMHead, MLMHead
from medvill_tpu.models.joint import JointEncoder


class CXRBERT(nn.Module):
    config: BertConfig
    image: ImageEncoderConfig
    img_position: bool = True

    def setup(self):
        self.enc = JointEncoder(self.config, self.image,
                                img_position=self.img_position, name="enc")
        self.mlm = MLMHead(self.config, name="mlm")
        self.itm = ITMHead(self.config.hidden_size, name="itm")

    def __call__(self, cls_tok, input_txt, mask_spec, segment, image, sep_tok,
                 pixel_indices: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, train_cnn: bool = False,
                 disturbing: bool = False, attention_fn=None):
        sequence, pooled = self.enc(
            cls_tok, input_txt, mask_spec, segment, image, sep_tok,
            pixel_indices=pixel_indices, deterministic=deterministic,
            train_cnn=train_cnn, disturbing=disturbing,
            attention_fn=attention_fn)
        word_emb = self.enc.embeddings.word_embeddings.embedding
        mlm_logits = self.mlm(sequence, word_emb)
        itm_logits = self.itm(pooled)
        return mlm_logits, itm_logits

    def encode(self, *args, **kwargs):
        """Expose (sequence, pooled) for retrieval/feature use."""
        return self.enc(*args, **kwargs)

    def features(self, cls_tok, input_txt, mask_spec, segment, image,
                 sep_tok, pixel_indices=None, deterministic: bool = True,
                 train_cnn: bool = False, disturbing: bool = False,
                 attention_fn=None):
        """(sequence, pooled) without head projections — lets the train step
        compute the MLM loss in position chunks so the [B, L, vocab] logits
        are never materialized (the full-logit path OOMs HBM at the
        reference's batch-36/seq-436 config)."""
        return self.enc(cls_tok, input_txt, mask_spec, segment, image,
                        sep_tok, pixel_indices=pixel_indices,
                        deterministic=deterministic, train_cnn=train_cnn,
                        disturbing=disturbing, attention_fn=attention_fn)

    def mlm_chunk(self, hidden_chunk):
        """Tied MLM head over a position chunk [B, C, H] -> [B, C, V]."""
        word_emb = self.enc.embeddings.word_embeddings.embedding
        return self.mlm(hidden_chunk, word_emb)

    def itm_logits(self, pooled):
        return self.itm(pooled)

    def itm_forward(self, cls_tok, input_txt, mask_spec, segment, image,
                    sep_tok, pixel_indices=None, deterministic: bool = True,
                    train_cnn: bool = False, attention_fn=None):
        """Alignment logits only — the retrieval forward
        (reference: Downstream_task/Retrieval/retrieval.py:12-32 wraps the
        pretrained CXRBERT and keeps enc + itm).  Skips the MLM head's
        [B, L, vocab] logits entirely.
        """
        _, pooled = self.enc(
            cls_tok, input_txt, mask_spec, segment, image, sep_tok,
            pixel_indices=pixel_indices, deterministic=deterministic,
            train_cnn=train_cnn, attention_fn=attention_fn)
        return self.itm(pooled)
