"""MMBT-style multilabel classification model.

Equivalent of ``MultimodalBertClf`` (reference:
Downstream_task/Classification/mmbt/models/mmbt.py:7-114).  Differences from
the pretrain joint encoder that matter for parity:

- image-segment embedding covers ``[CLS] img(N) [SEP]`` with position ids
  ``arange(N+2)`` (mmbt.py:22-42) — not the position-0 trick of the
  pretrain path;
- token types: image segment 0, text segment 1 (data/dataset.py:78-83
  shifts text segments to 1);
- attention is 1-D: ``ones(N+2) ++ txt_mask`` broadcast over rows —
  i.e. MaskVariant.FULL semantics with the text valid length
  (mmbt.py:68-88);
- image encoder: ResNet-50 trunk, all fibers (the pool configs for
  num_image_embeds 1-9 exist but the 256-embed config bypasses pooling;
  models/image.py:16-56);
- the classifier head is a single Linear (the unused ``clf`` inside the
  reference encoder is not replicated).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig, MaskVariant
from medvill_tpu.data.masks import MaskGeometry, bias_from_spec
from medvill_tpu.models.bert import BertEmbeddings, BertEncoder, BertPooler
from medvill_tpu.models.heads import ClfHead
from medvill_tpu.models.resnet import (ResNet50Trunk, fibers,
                                       half_pooled_fibers, pooled_fibers)


class MultimodalBertEncoder(nn.Module):
    config: BertConfig
    image: ImageEncoderConfig

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        self.img_projection = nn.Dense(
            cfg.hidden_size,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            dtype=jnp.dtype(cfg.compute_dtype), name="img_projection")
        self.img_encoder = ResNet50Trunk(
            dtype=jnp.dtype(cfg.compute_dtype),
            remat=self.image.remat_blocks,
            s2d_stem=getattr(self.image, "s2d_stem", True),
            name="img_encoder")
        self.encoder = BertEncoder(cfg, remat=cfg.remat,
                           name="encoder")
        self.pooler = BertPooler(cfg, name="pooler")

    def __call__(self, input_txt: jnp.ndarray, txt_len: jnp.ndarray,
                 segment: jnp.ndarray, image: jnp.ndarray,
                 cls_id: int, sep_id: int,
                 deterministic: bool = True, train_cnn: bool = False,
                 attention_fn=None) -> jnp.ndarray:
        """input_txt [B, T] int32; txt_len [B] valid text positions;
        segment [B, T] (ones); image [B, H, W, 3].  Returns pooled [B, hid].
        """
        cfg = self.config
        B, T = input_txt.shape
        N = self.image.num_image_embeds

        fmap = self.img_encoder(image, train=train_cnn)
        if self.image.encoder == "pool":
            # 1-9-embed adaptive-pool table (mmbt/models/image.py:30-39)
            img_feats = pooled_fibers(fmap, N, self.image.pool_type)
        elif self.image.encoder == "pool-half":
            img_feats = half_pooled_fibers(fmap, self.image.pool_type)[:, :N]
        else:
            img_feats = fibers(fmap)[:, :N]  # all fibers (full-fiber path)
        img_vecs = self.img_projection(img_feats)

        cls_ids = jnp.full((B, 1), cls_id, jnp.int32)
        sep_ids = jnp.full((B, 1), sep_id, jnp.int32)
        cls_emb = self.embeddings.word_embeddings(cls_ids)
        sep_emb = self.embeddings.word_embeddings(sep_ids)
        token_embeddings = jnp.concatenate(
            [cls_emb.astype(img_vecs.dtype), img_vecs,
             sep_emb.astype(img_vecs.dtype)], axis=1)

        seq_len = N + 2
        pos_ids = jnp.broadcast_to(jnp.arange(seq_len, dtype=jnp.int32),
                                   (B, seq_len))
        type_ids = jnp.zeros((B, seq_len), jnp.int32)
        img_embed = (token_embeddings
                     + self.embeddings.position_embeddings(pos_ids)
                     + self.embeddings.token_type_embeddings(type_ids))
        img_embed = self.embeddings.LayerNorm(img_embed)
        img_embed = self.embeddings.dropout(
            img_embed, deterministic=deterministic).astype(
            jnp.dtype(cfg.compute_dtype))

        txt_embed = self.embeddings(input_txt, token_type_ids=segment,
                                    deterministic=deterministic)
        encoder_input = jnp.concatenate([img_embed, txt_embed], axis=1)

        # 1-D mask -> FULL bias: valid cols = img block + txt_len
        geom = MaskGeometry(num_image_embeds=N, seq_len=T - 1)
        spec = jnp.stack(
            [jnp.full_like(txt_len, int(MaskVariant.FULL)), txt_len], axis=-1)
        bias = None if attention_fn is not None else bias_from_spec(spec, geom)

        hidden, _ = self.encoder(encoder_input, bias,
                                 deterministic=deterministic,
                                 attention_fn=attention_fn)
        return self.pooler(hidden)


class MultimodalBertClf(nn.Module):
    config: BertConfig
    image: ImageEncoderConfig
    n_classes: int

    def setup(self):
        self.enc = MultimodalBertEncoder(self.config, self.image, name="enc")
        self.clf = ClfHead(self.n_classes, name="clf")

    def __call__(self, input_txt, txt_len, segment, image, cls_id, sep_id,
                 deterministic: bool = True, train_cnn: bool = False,
                 attention_fn=None):
        pooled = self.enc(input_txt, txt_len, segment, image, cls_id, sep_id,
                          deterministic=deterministic, train_cnn=train_cnn,
                          attention_fn=attention_fn)
        return self.clf(pooled)
