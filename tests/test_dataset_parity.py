"""Field-by-field parity of the pretrain dataset against a literal NumPy
transcription of the reference ``CXRDataset.__getitem__``
(data/dataset_origin.py:80-235), sharing the same ``random.Random`` stream —
locks tokenization, RNG consumption order, masking, padding, label layout,
and the mask spec."""
import random

import numpy as np
import pytest

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     MaskVariant, PretrainConfig)
from medvill_tpu.data.masks import MaskGeometry, reference_dense_mask
from medvill_tpu.data.pretrain import CXRPretrainDataset, synthetic_records
from medvill_tpu.data.sampling import labels_match
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab

SEQ_LEN = 7
N_IMG = 3


def reference_getitem(data, idx, tokenizer, vocab, rng,
                      variant_flags):
    """Literal transcription of dataset_origin.py:80-181 (intended
    behavior: args.disturbing_mask for the broken self.disturbing_mask)."""
    # random_pair_sampling (:211-229)
    d = data[idx]
    itm_prob = rng.random()
    if itm_prob > 0.5:
        origin_txt, img_path, is_aligned = d["text"], d["img"], 1
    else:
        for _ in range(300):
            cand = data[rng.randint(0, len(data) - 1)]
            if not labels_match(d["label"], cand["label"]):
                origin_txt, img_path, is_aligned = (cand["text"], d["img"],
                                                    0)
                break

    tokens = tokenizer.tokenize(origin_txt)
    while len(tokens) > SEQ_LEN:
        tokens.pop()
    encoded = [vocab.get(w, vocab["[UNK]"]) for w in tokens]

    # random_word (:183-209)
    labels = []
    for i, token in enumerate(encoded):
        prob = rng.random()
        if prob < 0.15:
            prob /= 0.15
            if prob < 0.8:
                encoded[i] = vocab["[MASK]"]
            elif prob < 0.9:
                encoded[i] = rng.randrange(len(vocab))
            labels.append(token)
        else:
            labels.append(-100)
    if all(l == -100 for l in labels):
        labels[0] = encoded[0]
        encoded[0] = vocab["[MASK]"]

    input_ids = encoded + [vocab["[SEP]"]]
    txt_labels_t = labels + [-100]
    txt_labels_i = [-100] * (N_IMG + 2)
    txt_len = len(input_ids)
    pad = [vocab["[PAD]"]] * (SEQ_LEN - txt_len + 1)
    input_ids = input_ids + pad
    txt_labels_t = txt_labels_t + [-100] * len(pad)
    txt_labels = txt_labels_i + txt_labels_t
    segment = [1] * (SEQ_LEN + 1)

    # variant resolution (:150-177)
    if variant_flags.get("Mixed"):
        variant = (MaskVariant.FULL
                   if rng.random() < variant_flags["bi_prob"]
                   else MaskVariant.S2S)
    elif variant_flags.get("BAR_attn"):
        variant = MaskVariant.BAR
    elif variant_flags.get("disturbing_mask"):
        variant = MaskVariant.NONCROSS
    elif variant_flags.get("attn_1d"):
        variant = MaskVariant.ATTN1D
    else:
        variant = MaskVariant.FULL
    return dict(input_txt=np.array(input_ids, np.int32),
                txt_labels=np.array(txt_labels, np.int32),
                segment=np.array(segment, np.int32),
                is_aligned=np.int32(is_aligned),
                variant=int(variant), txt_len=txt_len)


@pytest.mark.parametrize("flags,cfg_kw", [
    ({"BAR_attn": True}, dict(bar_attn=True)),
    ({}, dict(bar_attn=False)),
    ({"Mixed": True, "bi_prob": 0.5},
     dict(bar_attn=False, mixed=True, s2s_prob=0.5, bi_prob=0.5)),
    ({"attn_1d": True}, dict(bar_attn=False, attn_1d=True)),
])
def test_dataset_matches_reference_transcription(flags, cfg_kw):
    vocab = build_vocab([f"word{i}" for i in range(50)])
    tok = BertTokenizer(vocab)
    recs = synthetic_records(24)
    cfg = PretrainConfig(
        seq_len=SEQ_LEN, bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=N_IMG),
        **cfg_kw)
    img = np.zeros((64, 64, 3), np.float32)
    ds = CXRPretrainDataset(recs, tok, cfg, seed=11,
                            image_loader=lambda p: img)
    ref_rng = random.Random(11)
    for idx in range(24):
        got = ds[idx]
        want = reference_getitem(recs, idx, tok, vocab, ref_rng, flags)
        np.testing.assert_array_equal(got["input_txt"], want["input_txt"],
                                      err_msg=f"idx={idx}")
        np.testing.assert_array_equal(got["txt_labels"], want["txt_labels"])
        np.testing.assert_array_equal(got["segment"], want["segment"])
        assert int(got["is_aligned"]) == int(want["is_aligned"])
        assert int(got["mask_spec"][0]) == want["variant"]
        assert int(got["mask_spec"][1]) == want["txt_len"]
        # the dense mask the reference would have shipped
        geom = MaskGeometry(N_IMG, SEQ_LEN)
        dense = reference_dense_mask(want["variant"], want["txt_len"], geom)
        assert dense.shape == (geom.total_len, geom.total_len)
