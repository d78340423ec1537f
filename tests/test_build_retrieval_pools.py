"""tools/build_retrieval_pools.py: trainer JSONL -> eval candidate pools.

Pins the pool contract the retrieval eval consumes (reference row layout
full_dset_retrieval.py:147; pools of eval_len_size per query,
full_dset_retrieval.py:145-162,652).
"""
import json
import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import build_retrieval_pools as bp  # noqa: E402

LABELS = ["'Edema'", "'Cardiomegaly'", "'Atelectasis', 'Edema'",
          "'No Finding'"]


def _records(n=8):
    rng = random.Random(0)
    return [{"id": f"s{i}", "split": "test", "label": LABELS[i % 4],
             "text": f"report text number {i} " + " ".join(
                 rng.choices(["lungs", "clear", "mild", "edema"], k=3)),
             "img": f"imgs/{i}.png"} for i in range(n)]


def test_pool_structure_label_conditioned_i2t():
    recs = _records()
    rows = bp.build_pools(recs, pool_size=4, direction="i2t", seed=1)
    assert len(rows) == len(recs) * 4
    for qi, q in enumerate(recs):
        pool = rows[qi * 4:(qi + 1) * 4]
        aligned = [r for r in pool if r["is_aligned"] == [1]]
        assert len(aligned) == 1
        assert aligned[0]["txt"] == q["text"]
        # i2t: the query image is fixed across the pool
        assert all(r["img"] == q["img"] for r in pool)
        assert all(r["label"] == q["label"] for r in pool)
        # label-conditioned negatives carry a DIFFERENT label set
        from medvill_tpu.data.sampling import labels_match
        for r in pool:
            if r["is_aligned"] == [0]:
                assert not labels_match(r["T_label"], q["label"])
        assert set(r.keys()) == {"id", "split", "label", "is_aligned",
                                 "T_label", "r_id", "txt", "img"}


def test_t2i_fixes_text_and_studyid_allows_same_label():
    recs = _records()
    rows = bp.build_pools(recs, pool_size=6, direction="t2i",
                          label_conditioned=False, seed=2)
    q = recs[0]
    pool = rows[:6]
    assert all(r["txt"] == q["text"] for r in pool)
    imgs = {r["img"] for r in pool}
    assert q["img"] in imgs and len(imgs) == 6
    # studyID protocol: same-label negatives are eligible (only the study
    # itself is excluded) — with 8 records and 4 labels some must share
    labels = {r["T_label"] for r in pool if r["is_aligned"] == [0]}
    assert any(l == q["label"] for l in labels) or len(labels) >= 3


def test_same_content_never_marked_negative():
    """Two frontal dicoms of one study share the report text (one record
    per dicom); under the studyID protocol the sibling's identical text
    must NOT appear as an is_aligned=0 candidate — that row would be the
    aligned pair mislabeled and cap R@1/MRR below 1 for a perfect model."""
    recs = _records(6)
    recs[1] = dict(recs[1], text=recs[0]["text"])   # sibling dicom
    rows = bp.build_pools(recs, pool_size=4, direction="i2t",
                          label_conditioned=False, seed=5)
    for qi, q in enumerate(recs):
        for r in rows[qi * 4:(qi + 1) * 4]:
            if r["is_aligned"] == [0]:
                assert r["txt"] != q["text"]
    # t2i: the sibling's identical img must not be a negative either
    recs = _records(6)
    recs[1] = dict(recs[1], img=recs[0]["img"])
    rows = bp.build_pools(recs, pool_size=4, direction="t2i",
                          label_conditioned=False, seed=5)
    for qi, q in enumerate(recs):
        for r in rows[qi * 4:(qi + 1) * 4]:
            if r["is_aligned"] == [0]:
                assert r["img"] != q["img"]


def test_no_eligible_negatives_message():
    """All-same-label split under label_conditioned: a descriptive error,
    even with --allow_replacement (rng.choice([]) would IndexError)."""
    recs = [dict(r, label="'No Finding'") for r in _records(4)]
    with pytest.raises(ValueError, match="no eligible negatives"):
        bp.build_pools(recs, pool_size=3, allow_replacement=True)


def test_insufficient_negatives_raises_unless_replacement():
    recs = _records(4)  # one record per label -> 3 eligible negatives each
    with pytest.raises(ValueError, match="eligible"):
        bp.build_pools(recs, pool_size=5)
    rows = bp.build_pools(recs, pool_size=5, allow_replacement=True)
    assert len(rows) == 4 * 5


def test_pools_feed_the_retrieval_eval(tmp_path):
    """End to end: built pools -> CXRRetrievalDataset(is_train=False) ->
    run_retrieval_eval; an oracle scorer must hit R@1 = MRR = 1.0 (proves
    pool shape/alignment survive the whole eval path, incl. the reference's
    'txt' key spelling)."""
    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         RetrievalConfig)
    from medvill_tpu.data.pretrain import BatchLoader
    from medvill_tpu.data.retrieval import CXRRetrievalDataset
    from medvill_tpu.data.tokenization import BertTokenizer
    from medvill_tpu.train.retrieve import run_retrieval_eval

    vocab = tmp_path / "vocab.txt"
    with open(vocab, "w") as f:
        for w in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "report",
                  "text", "number", "lungs", "clear", "mild", "edema"]:
            f.write(w + "\n")
    recs = _records()
    rows = bp.build_pools(recs, pool_size=4, seed=3)
    cfg = RetrievalConfig(
        bert=BertConfig.from_name("test-tiny", 32), seq_len=7,
        eval_len_size=4,
        image=ImageEncoderConfig(num_image_embeds=3, img_size=8))
    ds = CXRRetrievalDataset(
        rows, BertTokenizer.from_vocab_file(str(vocab)), cfg,
        is_train=False,
        image_loader=lambda p: np.zeros((8, 8, 3), np.float32))
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False)

    def oracle_score(state, batch):
        # perfect scorer: follows the pool's own alignment labels
        return np.asarray(batch["is_aligned"], np.float32)

    res = run_retrieval_eval(oracle_score, None, loader, 4, "i2t")
    assert res["mrr"] == 1.0
    assert res["hits"]["i2t_retrieval"]["R@1"] == 1.0
