"""UniLM-style finetune model for report generation / VQA, plus the
incremental decoder backbone.

Equivalent of ``BertForPreTrainingLossMask`` / ``CXRBertDecoder`` /
``BertModelIncr`` (reference: sc/pytorch_pretrained_bert/model.py:903-1129,
830-862).  Semantics kept:

- image segment embedding = [CLS word-emb, Linear(2048->H) fibers, SEP
  word-emb] with position embeddings [pos 0, pos(vis_pe), pos(len_vis+1)]
  and the segment's token types (4 for s2s with new_segment_ids)
  (model.py:864-900 — note fiber i gets position id i, overlapping CLS at 0);
- text positions restart at 0 in the *training* forward (the vendored
  BertEmbeddings defaults position_ids to arange over the slice,
  model.py:243-247) while the *decode* path uses the explicit layout
  0..len_vis+1 then len_vis+2.. (sc/data_loader.py:499-505) — a reference
  train/decode inconsistency we reproduce for parity;
- the vendored stack uses LayerNorm eps=1e-5 (model.py:238), unlike the HF
  pretrain stack's 1e-12 — so build configs for this model with
  ``layer_norm_eps=1e-5``;
- report-gen loss gathers masked positions then CE / label smoothing +
  drop-worst (model.py:986-1054) — implemented in
  medvill_tpu/train/finetune.py;
- VQA: classifier over sequence_output[:, 0] in training, over
  ``h[:,0] * h[:,len_vis+1]`` at inference (model.py:1016-1041, 979-984).

TPU decode design: a true per-layer K/V cache written in place with
``lax.dynamic_update_slice`` — the reference instead caches hidden states
and recomputes K/V over ``cat(history, new)`` each step (model.py:285-294);
identical math since K/V are per-position linear maps (equivalence test in
tests/test_decode_equivalence.py).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig
from medvill_tpu.models.bert import BertEmbeddings, BertEncoder, BertPooler
from medvill_tpu.models.heads import MLMHead, VQAHead
from medvill_tpu.models.resnet import ResNet50Trunk, fibers


class VLPEncoder(nn.Module):
    """Image-aware BERT with the UniLM finetune layout:
    ``[CLS] img(N) [SEP] txt...`` inside one max_len window."""

    config: BertConfig
    image: ImageEncoderConfig
    len_vis_input: int = 256
    img_position: bool = True

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

    def encode_image(self, image: jnp.ndarray,
                     pixel_indices: Optional[jnp.ndarray] = None,
                     train: bool = False):
        fmap = self.img_encoder(image, train=train)
        feats = fibers(fmap)
        B, M, _ = feats.shape
        pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
        if pixel_indices is not None:
            feats = jnp.take(feats, pixel_indices, axis=1)
            pos = jnp.take(pos, pixel_indices, axis=1)
        elif M != self.len_vis_input:
            # the reference assumes fiber count == len_vis_input (256 at
            # 512px); slice defensively for other geometries
            feats = feats[:, :self.len_vis_input]
            pos = pos[:, :self.len_vis_input]
        return feats, pos

    def embed_image_segment(self, input_ids_seg: jnp.ndarray,
                            feats: jnp.ndarray, vis_pe: jnp.ndarray,
                            token_type_ids: jnp.ndarray,
                            deterministic: bool) -> jnp.ndarray:
        """(model.py:864-900).  input_ids_seg: [B, N+2] — only its first
        ([CLS]) and last ([SEP]) ids are used."""
        B = feats.shape[0]
        N = self.len_vis_input
        cls_emb = self.embeddings.word_embeddings(input_ids_seg[:, :1])
        sep_emb = self.embeddings.word_embeddings(input_ids_seg[:, -1:])
        img_emb = self.img_projection(feats)
        token_embeddings = jnp.concatenate(
            [cls_emb.astype(img_emb.dtype), img_emb,
             sep_emb.astype(img_emb.dtype)], axis=1)
        if self.img_position:
            pos0 = jnp.zeros((B, 1), jnp.int32)
            pos_sep = jnp.full((B, 1), N + 1, jnp.int32)
            pos_ids = jnp.concatenate([pos0, vis_pe.astype(jnp.int32),
                                       pos_sep], axis=1)
            x = (token_embeddings
                 + self.embeddings.position_embeddings(pos_ids)
                 + self.embeddings.token_type_embeddings(token_type_ids))
        else:
            x = (token_embeddings
                 + self.embeddings.token_type_embeddings(token_type_ids))
        x = self.embeddings.LayerNorm(x)
        x = self.embeddings.dropout(x, deterministic=deterministic)
        return x.astype(jnp.dtype(self.config.compute_dtype))

    def __call__(self, image: jnp.ndarray, input_ids: jnp.ndarray,
                 token_type_ids: jnp.ndarray, bias: jnp.ndarray,
                 pixel_indices: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, train_cnn: bool = False,
                 attention_fn=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full (training) forward.  Returns (sequence, pooled)."""
        N2 = self.len_vis_input + 2
        feats, vis_pe = self.encode_image(image, pixel_indices,
                                          train=train_cnn)
        img_embed = self.embed_image_segment(
            input_ids[:, :N2], feats, vis_pe, token_type_ids[:, :N2],
            deterministic)
        # text positions restart at 0 (vendored BertEmbeddings default)
        txt_embed = self.embeddings(input_ids[:, N2:],
                                    token_type_ids=token_type_ids[:, N2:],
                                    deterministic=deterministic)
        x = jnp.concatenate([img_embed, txt_embed], axis=1)
        hidden, _ = self.encoder(x, bias, deterministic=deterministic,
                                 attention_fn=attention_fn)
        return hidden, self.pooler(hidden)

    # ---------------- incremental decode path ----------------

    def prefill_embed(self, image: jnp.ndarray, input_ids_seg: jnp.ndarray,
                      token_type_ids_seg: jnp.ndarray,
                      pixel_indices: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
        """Image-segment embedding only (everything before the encoder) —
        the prefill front half, exposed so the scan-over-layers decode
        backend (models/decoder.py) can run the encoder itself."""
        feats, vis_pe = self.encode_image(image, pixel_indices, train=False)
        return self.embed_image_segment(
            input_ids_seg, feats, vis_pe, token_type_ids_seg,
            deterministic=True)

    def prefill(self, image: jnp.ndarray, input_ids_seg: jnp.ndarray,
                token_type_ids_seg: jnp.ndarray, kv_caches,
                bias: jnp.ndarray,
                pixel_indices: Optional[jnp.ndarray] = None):
        """Encode the image segment, writing K/V into the caches at [0, N+2).
        Returns (hidden_seg, new_caches)."""
        img_embed = self.prefill_embed(image, input_ids_seg,
                                       token_type_ids_seg, pixel_indices)
        hidden, new_caches = self.encoder(
            img_embed, bias, deterministic=True, kv_caches=kv_caches,
            cache_index=0)
        return hidden, new_caches

    def decode_window(self, token_ids: jnp.ndarray,
                      position_ids: jnp.ndarray,
                      token_type_ids: jnp.ndarray, kv_caches,
                      cache_index, bias: jnp.ndarray):
        """Process a W-position text window (committed token + [MASK] probe)
        against the cache.  bias: [B,1,W,L_cache]."""
        x = self.embeddings(token_ids, token_type_ids=token_type_ids,
                            position_ids=position_ids, deterministic=True)
        hidden, new_caches = self.encoder(
            x, bias, deterministic=True, kv_caches=kv_caches,
            cache_index=cache_index)
        return hidden, new_caches

    def init_kv_caches(self, batch: int, max_len: int):
        cfg = self.config
        return [
            (jnp.zeros((batch, max_len, cfg.num_attention_heads,
                        cfg.head_dim), jnp.dtype(cfg.compute_dtype)),
             jnp.zeros((batch, max_len, cfg.num_attention_heads,
                        cfg.head_dim), jnp.dtype(cfg.compute_dtype)))
            for _ in range(cfg.num_hidden_layers)]


class VLPForPreTraining(nn.Module):
    """Finetune model: VLPEncoder + tied MLM head (report-gen) + VQA head."""

    config: BertConfig
    image: ImageEncoderConfig
    len_vis_input: int = 256
    task: str = "report_generation"  # report_generation | vqa
    n_answers: int = 458

    def setup(self):
        self.bert = VLPEncoder(self.config, self.image,
                               len_vis_input=self.len_vis_input, name="bert")
        self.cls = MLMHead(self.config, name="cls")
        if self.task == "vqa":
            self.ans_classifier = VQAHead(self.config.hidden_size,
                                          self.n_answers,
                                          name="ans_classifier")

    def __call__(self, image, input_ids, token_type_ids, bias,
                 masked_pos: Optional[jnp.ndarray] = None,
                 pixel_indices=None, deterministic: bool = True,
                 train_cnn: bool = False, attention_fn=None,
                 vqa_inference: bool = False,
                 task_idx: Optional[jnp.ndarray] = None):
        sequence, pooled = self.bert(
            image, input_ids, token_type_ids, bias,
            pixel_indices=pixel_indices, deterministic=deterministic,
            train_cnn=train_cnn, attention_fn=attention_fn)
        if self.task == "vqa":
            if vqa_inference:
                # CLS * last-image-token product (model.py:979-984)
                vqa_embed = sequence[:, 0] * sequence[:, self.len_vis_input + 1]
            else:
                vqa_embed = sequence[:, 0]
            return self.ans_classifier(vqa_embed)
        # gather masked positions then project to vocab (model.py:1043-1046)
        gathered = jnp.take_along_axis(
            sequence, masked_pos[..., None].astype(jnp.int32), axis=1)
        word_emb = self.bert.embeddings.word_embeddings.embedding
        return self.cls(gathered, word_emb, task_idx=task_idx)

    # decode-time entry points (used by medvill_tpu/models/decoder.py)
    def decode_prefill(self, image, input_ids_seg, token_type_ids_seg,
                       kv_caches, bias, pixel_indices=None):
        return self.bert.prefill(image, input_ids_seg, token_type_ids_seg,
                                 kv_caches, bias,
                                 pixel_indices=pixel_indices)

    def decode_step(self, token_ids, position_ids, token_type_ids,
                    kv_caches, cache_index, bias, task_idx=None):
        hidden, new_caches = self.bert.decode_window(
            token_ids, position_ids, token_type_ids, kv_caches, cache_index,
            bias)
        return self.decode_logits(hidden, task_idx=task_idx), new_caches

    # split entry points for the scan-over-layers decode backend
    # (models/decoder.py): embedding / prefill front half / logits tail,
    # with the encoder's layer loop run OUTSIDE the module as a lax.scan
    # over stacked per-layer params (12x smaller decode HLO -> minutes
    # instead of tens of minutes of XLA compile through the remote
    # compile service)
    def decode_embed(self, token_ids, position_ids, token_type_ids):
        return self.bert.embeddings(token_ids,
                                    token_type_ids=token_type_ids,
                                    position_ids=position_ids,
                                    deterministic=True)

    def decode_prefill_embed(self, image, input_ids_seg, token_type_ids_seg,
                             pixel_indices=None):
        return self.bert.prefill_embed(image, input_ids_seg,
                                       token_type_ids_seg, pixel_indices)

    def decode_logits(self, hidden, task_idx=None):
        """MLM logits of the LAST window position: [B, V]."""
        word_emb = self.bert.embeddings.word_embeddings.embedding
        # decode is always the s2s pipeline: task_idx=3 under
        # relax_projection (sc/data_loader.py:464)
        if task_idx is None and getattr(self.config, "relax_projection",
                                        0) > 1:
            task_idx = jnp.full((hidden.shape[0],), 3, jnp.int32)
        logits = self.cls(hidden[:, -1:, :], word_emb, task_idx=task_idx)
        return logits[:, 0, :]
