"""CNN_BERT late-fusion baseline.

Equivalent of ``CNN_BERT`` (reference: CNN_BERT/main_cnn_bert.py:124-195):
- IMG_Encoder: ResNet-50 trunk + global mean over spatial fibers -> [B, 2048]
  (main_cnn_bert.py:124-136);
- TXT_Encoder: BERT pooled [CLS] -> [B, 768] (main_cnn_bert.py:138-177);
- head: concat(2048 + 768) -> Linear -> 2 (main_cnn_bert.py:179-195).

Used by retrieval as the non-CXRBERT branch
(full_dset_retrieval.py:38,549-555).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig
from medvill_tpu.models.bert import BertEmbeddings, BertEncoder, BertPooler
from medvill_tpu.models.resnet import ResNet50Trunk, fibers


class ImgGlobalEncoder(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fmap = ResNet50Trunk(dtype=self.dtype, name="trunk")(image,
                                                             train=train)
        return fibers(fmap).mean(axis=1)  # [B, 2048]


class TxtPooledEncoder(nn.Module):
    config: BertConfig

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        self.encoder = BertEncoder(cfg, remat=cfg.remat,
                           name="encoder")
        self.pooler = BertPooler(cfg, name="pooler")

    def __call__(self, input_ids, attn_len, segment, deterministic=True,
                 attention_fn=None):
        import jax

        B, T = input_ids.shape
        x = self.embeddings(input_ids, token_type_ids=segment,
                            deterministic=deterministic)
        c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
        bias = jnp.where(c < attn_len[:, None, None, None], 0.0, -10000.0)
        hidden, _ = self.encoder(x, bias, deterministic=deterministic,
                                 attention_fn=attention_fn)
        return self.pooler(hidden)


class CNNBert(nn.Module):
    config: BertConfig
    n_classes: int = 2

    def setup(self):
        self.img_encoder = ImgGlobalEncoder(
            dtype=jnp.dtype(self.config.compute_dtype), name="img_encoder")
        self.txt_encoder = TxtPooledEncoder(self.config, name="txt_encoder")
        self.fc = nn.Dense(self.n_classes, name="fc")

    def __call__(self, input_ids, attn_len, segment, image,
                 deterministic=True, train_cnn=False, attention_fn=None):
        img_vec = self.img_encoder(image, train=train_cnn)
        txt_vec = self.txt_encoder(input_ids, attn_len, segment,
                                   deterministic=deterministic,
                                   attention_fn=attention_fn)
        joint = jnp.concatenate(
            [img_vec.astype(jnp.float32), txt_vec.astype(jnp.float32)],
            axis=-1)
        return self.fc(joint)
