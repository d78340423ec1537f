"""Attention-mask *specs* and their on-device dense realizations.

The reference materializes an ``[L, L]`` int64 mask per sample inside the
DataLoader (reference: data/dataset_origin.py:140-177) and ships it to the
device, where it becomes an additive bias ``(1 - m) * -10000`` (reference:
models/cxrbert_origin.py:75-85).  On TPU we ship a 2-int spec per sample —
``(variant_id, txt_len)`` — and compute block visibility analytically on
device with broadcasted iotas (XLA) or inside the Pallas flash-attention
kernel.  Dense semantics are bit-matched to the reference, including its
quirks:

- S2S builds the causal tril over the *padded* text block because the
  reference computes ``len(input_ids)`` after padding was appended
  (dataset_origin.py:122,144-148).
- NONCROSS fills whole I/T blocks with ones, i.e. no padding mask
  (dataset_origin.py:163-167).
- ATTN1D's 1-D mask broadcasts over rows, which equals FULL densely
  (dataset_origin.py:170-172, cxrbert_origin.py:76-77).

Sequence layout (pretrain): ``[CLS] img(N) [SEP] txt(seq_len) [SEP+pad]``,
``L = seq_len + N + 3``; the "image block" spans columns ``[0, N+2)`` (CLS +
N image embeds + SEP) and the text block spans ``[N+2, L)``
(dataset_origin.py:37,144-148).

The finetune (UniLM-style) layout differs: ``[CLS] img(N) [SEP] txt...`` with
its own s2s/bar/bi construction (reference: sc/data_loader.py:395-412); see
`seq2seq_dense_mask`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from medvill_tpu.core.config import MaskVariant

NEG_BIAS = -10000.0  # reference: cxrbert_origin.py:83, sc/.../model.py:819


@dataclasses.dataclass(frozen=True)
class MaskGeometry:
    """Static geometry of the joint sequence (compile-time constants).

    ``extra_text_cls`` covers the NONCROSS/disturbing layout, which inserts an
    additional text-CLS token after [SEP] (reference:
    models/cxrbert_origin.py:91-112).  The reference dataset builds that mask
    at the *un-extended* length (dataset_origin.py:164-167) — a shape bug it
    never hits because dataset_origin.py:104 references a missing attribute;
    we build it at the correct extended length and document the divergence.
    """

    num_image_embeds: int
    seq_len: int  # max text tokens (excl. the trailing [SEP])
    extra_text_cls: bool = False

    @property
    def img_block(self) -> int:
        """CLS + image embeds + SEP."""
        return self.num_image_embeds + 2

    @property
    def total_len(self) -> int:
        return self.seq_len + self.num_image_embeds + 3 + (
            1 if self.extra_text_cls else 0)


def make_spec(variant: MaskVariant | int, txt_len: int) -> np.ndarray:
    """Host-side per-sample spec: int32[2] = (variant, txt_len).

    ``txt_len`` counts valid text positions *including* the trailing [SEP]
    (reference appends [SEP] before computing attn_masks_t;
    dataset_origin.py:109,113).
    """
    return np.array([int(variant), int(txt_len)], dtype=np.int32)


def dense_mask_from_spec(spec: jnp.ndarray, geom: MaskGeometry) -> jnp.ndarray:
    """[B, 2] int32 spec -> [B, L, L] int32 dense mask (1 = visible).

    Pure jnp; runs fused on device.  Bit-matched against the reference
    construction (golden-tested in tests/test_masks.py).
    """
    variant = spec[:, 0][:, None, None]            # [B,1,1]
    txt_len = spec[:, 1][:, None, None]            # [B,1,1]
    L = geom.total_len
    I2 = geom.img_block

    r = jax.lax.broadcasted_iota(jnp.int32, (1, L, L), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, L, L), 2)

    # valid(c): image block always valid; text cols valid for c-I2 < txt_len
    valid_c = (c < I2) | (c - I2 < txt_len)

    full = valid_c
    s2s = (c < I2) | ((r >= I2) & (c >= I2) & (c <= r))
    bar = s2s | (r < I2)
    noncross = ((r < I2) & (c < I2)) | ((r >= I2) & (c >= I2))

    out = jnp.where(variant == MaskVariant.S2S, s2s,
          jnp.where(variant == MaskVariant.BAR, bar,
          jnp.where(variant == MaskVariant.NONCROSS, noncross,
                    full)))  # FULL and ATTN1D share dense semantics
    return out.astype(jnp.int32)


def bias_from_spec(spec: jnp.ndarray, geom: MaskGeometry,
                   dtype=jnp.float32) -> jnp.ndarray:
    """[B, 2] spec -> [B, 1, L, L] additive bias ``(1-m) * -10000``
    (reference: cxrbert_origin.py:75-85)."""
    m = dense_mask_from_spec(spec, geom)
    return ((1.0 - m.astype(dtype)) * NEG_BIAS)[:, None, :, :]


def resolve_mixed(rng, s2s_prob: float, bi_prob: float) -> MaskVariant:
    """Per-sample MIXED resolution (reference: dataset_origin.py:152-156,
    random.choices(mixed_lst, weights=[bi_prob, s2s_prob]))."""
    assert abs(s2s_prob + bi_prob - 1.0) < 1e-6
    return MaskVariant.FULL if rng.random() < bi_prob else MaskVariant.S2S


# ---------------------------------------------------------------------------
# Reference-algorithm reimplementation (NumPy), used as the golden oracle in
# tests and by the host pipeline when a dense mask is explicitly requested.
# Mirrors data/dataset_origin.py:140-177 literally.
# ---------------------------------------------------------------------------

def reference_dense_mask(variant: MaskVariant | int, txt_len: int,
                         geom: MaskGeometry) -> np.ndarray:
    L = geom.total_len
    I2 = geom.img_block
    variant = MaskVariant(int(variant))

    attn_1d = np.zeros(L, dtype=np.int64)
    attn_1d[:I2] = 1
    attn_1d[I2:I2 + txt_len] = 1

    if variant in (MaskVariant.FULL, MaskVariant.ATTN1D):
        # full_attn: 1-D mask row-broadcast (dataset_origin.py:140-141);
        # attn_1d expands identically in get_extended_attn_mask.
        return np.broadcast_to(attn_1d, (L, L)).copy()

    if variant in (MaskVariant.S2S, MaskVariant.BAR):
        m = np.zeros((L, L), dtype=np.int64)
        m[:, :I2] = 1
        # tril over the padded text block: second_end = I2 + len(input_ids)
        # where input_ids includes padding (dataset_origin.py:122,144-148)
        tril = np.tril(np.ones((L - I2, L - I2), dtype=np.int64))
        m[I2:, I2:] = tril
        if variant == MaskVariant.BAR:
            m[:I2, :] = 1  # dataset_origin.py:160
        return m

    if variant == MaskVariant.NONCROSS:
        m = np.zeros((L, L), dtype=np.int64)
        m[:I2, :I2] = 1
        m[I2:, I2:] = 1
        return m

    raise ValueError(variant)


# ---------------------------------------------------------------------------
# UniLM-style finetune masks (reference: sc/data_loader.py:354-412).
# Layout: [CLS] img(N) [SEP] txt(max_len_b) [SEP] + pad, all within
# max_seq_length; the text segment starts at len_vis_input + 2.
# ---------------------------------------------------------------------------

class Seq2seqMaskMode:
    S2S = "s2s"
    BAR = "bar"
    BI = "bi"


def seq2seq_dense_mask(mode: str, n_tokens: int, len_vis_input: int,
                       max_len: int) -> np.ndarray:
    """Reference finetune mask construction, bit-matched
    (sc/data_loader.py:395-412).

    ``n_tokens`` = len(tokens) = 1 + len_vis_input + 1 + len(tokens_b) + 1
    before padding (CLS + img + SEP + txt + SEP).  Reference quirks kept:
    image columns are visible to *all* rows including padding rows
    (``input_mask[:, :vis].fill_(1)``), bi broadcasts the 1-D valid mask over
    all rows, and bar opens image rows to *all* columns including padding
    (``input_mask[:vis, :].fill_(1)``).
    """
    m = np.zeros((max_len, max_len), dtype=np.int64)
    vis = len_vis_input + 2  # CLS + img + SEP
    if mode == Seq2seqMaskMode.BI:
        # data_loader.py:410-412: 1-D valid mask expanded over all rows
        m[:, :n_tokens] = 1
        return m
    # s2s/bar: image cols visible to every row (data_loader.py:399/406)
    m[:, :vis] = 1
    # causal tril over the square valid-text region [vis:n, vis:n]
    # (second_st=vis, second_end=n_tokens; data_loader.py:396,401-402/407-408)
    t = n_tokens - vis
    m[vis:n_tokens, vis:n_tokens] = np.tril(np.ones((t, t), dtype=np.int64))
    if mode == Seq2seqMaskMode.BAR:
        # bar: image rows see all columns incl. padding (data_loader.py:400)
        m[:vis, :] = 1
    return m


def seq2seq_spec_dense(variant_id: jnp.ndarray, n_tokens: jnp.ndarray,
                       len_vis_input: int, max_len: int) -> jnp.ndarray:
    """Device-side version of `seq2seq_dense_mask` from per-sample specs.

    variant_id: [B] int32 with 0=bi, 1=s2s, 2=bar; n_tokens: [B] int32.
    Returns [B, L, L] int32.
    """
    v = variant_id[:, None, None]
    n = n_tokens[:, None, None]
    vis = len_vis_input + 2
    L = max_len
    r = jax.lax.broadcasted_iota(jnp.int32, (1, L, L), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, L, L), 2)

    bi = c < n
    causal_txt = (r >= vis) & (r < n) & (c >= vis) & (c <= r)
    s2s = (c < vis) | causal_txt
    bar = s2s | (r < vis)
    out = jnp.where(v == 1, s2s, jnp.where(v == 2, bar, bi))
    return out.astype(jnp.int32)


def decoder_dense_mask(max_a_len: int, max_len_in_batch: int) -> np.ndarray:
    """Decode-time s2s mask (sc/data_loader.py:521-528): image block
    ``[0, len_vis+2)`` visible to all rows; causal tril over
    ``[max_a_len+2, max_len_in_batch)``.  With ``max_a_len == len_vis_input``
    (the decode CLI always passes that) the two block boundaries coincide."""
    vis = max_a_len + 2
    L = max_len_in_batch
    m = np.zeros((L, L), dtype=np.int64)
    m[:, :vis] = 1
    t = L - vis
    m[vis:, vis:] = np.tril(np.ones((t, t), dtype=np.int64))
    return m


SEQ2SEQ_VARIANT_IDS = {Seq2seqMaskMode.BI: 0, Seq2seqMaskMode.S2S: 1,
                       Seq2seqMaskMode.BAR: 2}
