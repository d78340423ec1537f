"""Single-stream joint encoder: ``[CLS] img(N) [SEP] txt`` -> BERT.

Equivalent of ``CXRBertEncoder`` (reference: models/cxrbert_origin.py:37-130):
- the visual trunk emits fiber features; ``pixel_indices`` selects
  ``num_image_embeds`` of them (random-pixel sampling, one permutation per
  step shared across the batch; reference: models/image.py:63-68) and doubles
  as the image position ids (models/image.py:60-68);
- image embeddings share the text position/token-type tables and LayerNorm
  (reference: ImageBertEmbeddings, models/cxrbert_origin.py:12-35);
- [CLS]/[SEP] are embedded via the text path as 1-token sequences, so both
  get position id 0 (reference: models/cxrbert_origin.py:115-119);
- attention runs under the additive-bias mask realized from the per-sample
  ``(variant, txt_len)`` spec, or the Pallas flash path.

The NONCROSS ("disturbing") layout inserts an extra text-CLS (segment 1,
position 0) after [SEP] and the CLS representation is the elementwise product
of positions 0 and num_image_embeds+2 (reference: cxrbert_origin.py:91-112).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig
from medvill_tpu.data.masks import MaskGeometry, bias_from_spec
from medvill_tpu.models.bert import (BertEmbeddings, BertEncoder, BertPooler)
from medvill_tpu.models.resnet import (ResNet50Trunk, fibers,
                                       half_pooled_fibers, pooled_fibers)


class ImagePatchEmbedding(nn.Module):
    """ViT-style patch embedding (reference: models/image.py:95-110)."""

    image_size: int
    patch_size: int
    dim: int = 2048
    channels: int = 3

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        from medvill_tpu.models.resnet import device_normalize

        img = device_normalize(img)  # uint8 wire format -> f32 normalized
        # img: [B, H, W, C] NHWC
        B, H, W, C = img.shape
        p = self.patch_size
        x = img.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // p) * (W // p),
                                                  p * p * C)
        return nn.Dense(self.dim, name="patch_to_embedding")(x)


class JointEncoder(nn.Module):
    """CXRBertEncoder equivalent.  One parameter tree shared by pretrain,
    classification, and retrieval."""

    config: BertConfig
    image: ImageEncoderConfig
    img_position: bool = True

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        # Linear(2048 -> hidden) (reference: cxrbert_origin.py:16)
        self.img_projection = nn.Dense(
            cfg.hidden_size,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            dtype=jnp.dtype(cfg.compute_dtype), name="img_projection")
        if self.image.encoder == "ViT":
            self.img_encoder = ImagePatchEmbedding(
                image_size=self.image.img_size,
                patch_size=self.image.patch_size,
                dim=self.image.img_hidden_size, name="img_encoder")
        else:
            self.img_encoder = ResNet50Trunk(
                dtype=jnp.dtype(cfg.compute_dtype),
                remat=self.image.remat_blocks,
                s2d_stem=getattr(self.image, "s2d_stem", True),
                name="img_encoder")
        self.encoder = BertEncoder(cfg, remat=cfg.remat,
                           name="encoder")
        self.pooler = BertPooler(cfg, name="pooler")

    def encode_image(self, image: jnp.ndarray,
                     pixel_indices: Optional[jnp.ndarray],
                     train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image [B,H,W,C] -> (features [B,N,2048], positions [B,N])."""
        if self.image.encoder == "ViT":
            feats = self.img_encoder(image)
            B, M, _ = feats.shape
            pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
            return feats, pos
        fmap = self.img_encoder(image, train=train)
        if self.image.encoder == "pool":
            # 1-9-embed adaptive-pool configs (mmbt/models/image.py:30-39)
            feats = pooled_fibers(fmap, self.image.num_image_embeds,
                                  self.image.pool_type)
        elif self.image.encoder == "pool-half":
            # (M/2, M/2) pooled variant (reference: models/image.py:71-93)
            feats = half_pooled_fibers(fmap, self.image.pool_type)
        else:
            feats = fibers(fmap)  # [B, M*M, 2048]
        B, M, _ = feats.shape
        pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
        if pixel_indices is not None:
            # random-pixel sampling: same sorted index set for the whole batch
            # this step (reference: models/image.py:63-68)
            feats = jnp.take(feats, pixel_indices, axis=1)
            pos = jnp.take(pos, pixel_indices, axis=1)
        return feats, pos

    def embed_image_tokens(self, feats: jnp.ndarray, positions: jnp.ndarray,
                           deterministic: bool) -> jnp.ndarray:
        """ImageBertEmbeddings: proj + shared pos/type + shared LN + dropout
        (reference: cxrbert_origin.py:22-35).  token_type = 0 for images."""
        projected = self.img_projection(feats)
        token_type = jnp.zeros(positions.shape, dtype=jnp.int32)
        if not self.img_position:
            positions = None
        if positions is None:
            x = projected + self.embeddings.token_type_embeddings(token_type)
        else:
            x = (projected
                 + self.embeddings.position_embeddings(positions)
                 + self.embeddings.token_type_embeddings(token_type))
        x = self.embeddings.LayerNorm(x)
        x = self.embeddings.dropout(x, deterministic=deterministic)
        return x.astype(jnp.dtype(self.config.compute_dtype))

    def __call__(self, cls_tok: jnp.ndarray, input_txt: jnp.ndarray,
                 mask_spec: jnp.ndarray, segment: jnp.ndarray,
                 image: jnp.ndarray, sep_tok: jnp.ndarray,
                 pixel_indices: Optional[jnp.ndarray] = None,
                 geom: Optional[MaskGeometry] = None,
                 deterministic: bool = True, train_cnn: bool = False,
                 disturbing: bool = False, attention_fn=None):
        """Returns (sequence [B,L,hid], pooled/cls_represent [B,hid]).

        cls_tok/sep_tok: [B,1] int32; input_txt: [B,seq_len+1]; segment:
        [B,seq_len+1] (ones; reference dataset_origin.py:129); mask_spec:
        [B,2] int32 (variant, txt_len).
        """
        cfg = self.config
        if geom is None:
            geom = MaskGeometry(self.image.num_image_embeds,
                                input_txt.shape[1] - 1,
                                extra_text_cls=disturbing)

        feats, img_pos = self.encode_image(image, pixel_indices,
                                           train=train_cnn)
        img_embed = self.embed_image_tokens(feats, img_pos, deterministic)

        zeros1 = jnp.zeros_like(cls_tok)
        cls_out = self.embeddings(cls_tok, token_type_ids=zeros1,
                                  deterministic=deterministic)
        sep_out = self.embeddings(sep_tok, token_type_ids=zeros1,
                                  deterministic=deterministic)
        txt_embed = self.embeddings(input_txt, token_type_ids=segment,
                                    deterministic=deterministic)

        if disturbing:
            txt_cls_out = self.embeddings(cls_tok, token_type_ids=zeros1 + 1,
                                          deterministic=deterministic)
            encoder_input = jnp.concatenate(
                [cls_out, img_embed, sep_out, txt_cls_out, txt_embed], axis=1)
        else:
            encoder_input = jnp.concatenate(
                [cls_out, img_embed, sep_out, txt_embed], axis=1)

        # with a kernel attention_fn the spec IS the mask — never
        # materialize the [B, 1, L, L] bias
        bias = (None if attention_fn is not None
                else bias_from_spec(mask_spec, geom))
        hidden, _ = self.encoder(encoder_input, bias,
                                 deterministic=deterministic,
                                 attention_fn=attention_fn)
        if disturbing:
            # elementwise product of joint-CLS and text-CLS representations
            # (reference: cxrbert_origin.py:109-110)
            cls_represent = hidden[:, 0] * hidden[:, geom.img_block]
            return hidden, cls_represent
        return hidden, self.pooler(hidden)
