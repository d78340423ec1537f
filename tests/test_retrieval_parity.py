"""RNG-stream-exact parity of the retrieval train dataset vs a literal
transcription of CXR_Retrieval_Dataset.__getitem__ (train branch,
full_dset_retrieval.py:108-229)."""
import random

import numpy as np
import pytest

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     MaskVariant, RetrievalConfig)
from medvill_tpu.data.retrieval import (CXRRetrievalDataset,
                                        synthetic_retrieval_records)
from medvill_tpu.data.sampling import labels_match
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab

SEQ_LEN = 7


def ref_process(txt, tokenizer, vocab):
    """(full_dset_retrieval.py:173-229, CXRBERT branch; text fields only)."""
    tokens = tokenizer.tokenize(txt)
    while len(tokens) > SEQ_LEN:
        tokens.pop()
    ids = [vocab.get(w, vocab["[UNK]"]) for w in tokens] + [vocab["[SEP]"]]
    txt_len = len(ids)
    ids = ids + [vocab["[PAD]"]] * (SEQ_LEN + 1 - txt_len)
    return np.array(ids, np.int32), txt_len


def ref_getitem(data, idx, tokenizer, vocab, rng):
    """Transcription of the train __getitem__ with label conditioning
    (full_dset_retrieval.py:118-141; get_random_line at :164-170 uses
    random.choice over all-but-idx — one _randbelow draw, same stream as
    our randrange-with-shift)."""
    d = data[idx]
    for _ in range(300):
        rand_idx = list(range(0, idx)) + list(range(idx + 1, len(data)))
        j = rng.choice(rand_idx)
        r_label, r_txt, r_img = data[j]["label"], data[j]["text"], \
            data[j]["img"]
        if not labels_match(d["label"], r_label):
            if rng.random() > 0.5:
                neg_img, neg_txt = r_img, d["text"]
            else:
                neg_img, neg_txt = d["img"], r_txt
            break
    pos_ids, pos_len = ref_process(d["text"], tokenizer, vocab)
    neg_ids, neg_len = ref_process(neg_txt, tokenizer, vocab)
    return (pos_ids, pos_len), (neg_ids, neg_len), neg_img


def test_retrieval_train_matches_transcription():
    vocab = build_vocab([f"word{i}" for i in range(50)])
    tok = BertTokenizer(vocab)
    recs = synthetic_retrieval_records(16, n_labels=3, seed=2)
    cfg = RetrievalConfig(
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3),
        seq_len=SEQ_LEN, img_size=64)
    img_paths = []
    ds = CXRRetrievalDataset(
        recs, tok, cfg, is_train=True, seed=9,
        image_loader=lambda p: (img_paths.append(p),
                                np.zeros((64, 64, 3), np.float32))[1])
    ref_rng = random.Random(9)
    for idx in range(16):
        img_paths.clear()
        _, pos, neg = ds[idx]
        (want_pos, want_pos_len), (want_neg, want_neg_len), want_neg_img = \
            ref_getitem(recs, idx, tok, vocab, ref_rng)
        np.testing.assert_array_equal(pos["input_txt"], want_pos,
                                      err_msg=f"idx={idx}")
        np.testing.assert_array_equal(neg["input_txt"], want_neg)
        assert int(pos["mask_spec"][1]) == want_pos_len
        assert int(neg["mask_spec"][1]) == want_neg_len
        assert int(pos["mask_spec"][0]) == int(MaskVariant.FULL)
        # positive keeps own image; negative image matches the transcription
        assert img_paths[0] == recs[idx]["img"]
        assert img_paths[1] == want_neg_img
