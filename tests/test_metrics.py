"""Metric functions vs hand-computed values (SURVEY.md §4)."""
import numpy as np
import pytest

from medvill_tpu.eval import metrics as M
from medvill_tpu.eval.bleu import corpus_bleu, language_eval_bleu


def test_compute_ranks():
    sim = np.array([[0.9, 0.1, 0.5], [0.2, 0.8, 0.3]])
    lab = np.array([[0, 0, 1], [1, 0, 0]])
    # q0 sorted: [0(.9), 2(.5), 1(.1)] -> first aligned at rank 1
    # q1 sorted: [1(.8), 2(.3), 0(.2)] -> first aligned at rank 2
    assert M.compute_ranks(sim, lab) == [1, 2]


def test_compute_ranks_no_aligned():
    sim = np.array([[0.9, 0.1]])
    lab = np.array([[0, 0]])
    assert M.compute_ranks(sim, lab) == [2]  # pool size


def test_mrr():
    # ranks 0,1 -> mean(1/1, 1/2) = 0.75 (reference adds 1 before recip)
    assert M.compute_mrr([0, 1]) == pytest.approx(0.75)


def test_recall_precision():
    sim = np.array([[0.9, 0.8, 0.1, 0.05]])
    lab = np.array([[1, 0, 1, 0]])
    out = M.compute_recall_precision(sim, lab, ks=(1,))
    # top1 = idx0 aligned -> hits 1; total aligned 2 -> R@1=0.5, P@1=1.0
    assert out["recall"]["R@1"] == pytest.approx(0.5)
    assert out["precision"]["R@1"] == pytest.approx(1.0)


def test_roc_auc_perfect_and_random():
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    assert M.roc_auc(scores, labels) == pytest.approx(1.0)
    labels2 = np.array([1, 0, 1, 0])
    # concordant pairs: (.9,.8),(.9,.1),(.2,.1) of 4 -> 0.75
    assert M.roc_auc(scores, labels2) == pytest.approx(0.75)


def test_roc_auc_ties_midrank():
    scores = np.array([0.5, 0.5, 0.5, 0.5])
    labels = np.array([1, 0, 1, 0])
    assert M.roc_auc(scores, labels) == pytest.approx(0.5)


def test_f1_micro():
    preds = np.array([[1, 0], [1, 1]])
    labels = np.array([[1, 0], [0, 1]])
    # tp=2 (0,0 & 1,1), fp=1 (1,0), fn=0 -> f1 = 2*2/(4+1+0) = 0.8
    assert M.f1_score(preds, labels, "micro") == pytest.approx(0.8)


def test_vqa_score():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    targets = np.array([[0.0, 0.6, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(M.vqa_score_with_logits(logits, targets),
                               [0.6, 0.0])


def test_corpus_bleu_identity():
    refs = [[["the", "cat", "sat"]]]
    hyps = [["the", "cat", "sat"]]
    b1, b2, b3, b4 = corpus_bleu(refs, hyps)
    assert (b1, b2, b3) == pytest.approx((1.0, 1.0, 1.0))
    assert b4 == 0.0  # no 4-grams exist in a 3-token sentence (nltk: 0)


def test_corpus_bleu_partial():
    refs = [[["the", "cat", "sat", "down"]]]
    hyps = [["the", "cat", "ran", "away"]]
    b1, b2, b3, b4 = corpus_bleu(refs, hyps)
    assert b1 == pytest.approx(0.5)       # 2/4 unigrams
    assert b2 == pytest.approx((0.5 * (1 / 3)) ** 0.5)
    assert b3 == 0.0 and b4 == 0.0        # no higher-order matches


def test_language_eval_bleu_csv(tmp_path):
    preds = [{"image_id": 1, "caption": "a b c", "gt_caption": "a b c"}]
    out = language_eval_bleu(preds, output_dir=str(tmp_path), run_name="t")
    assert out["Bleu_1"] == pytest.approx(1.0)
    assert (tmp_path / "t.csv").exists() and (tmp_path / "t_gt.csv").exists()


def test_chexpert_v2_v4():
    from medvill_tpu.eval.chexpert import label_accuracy_v2, label_accuracy_v4
    ref = np.array([[1.0, 0.0, np.nan], [np.nan, np.nan, np.nan]])
    hyp = np.array([[1.0, -1.0, np.nan], [1.0, np.nan, np.nan]])
    acc, arr = label_accuracy_v2(hyp, ref)
    # row0: agree on col0 only (NaN==NaN is False); 2 non-nan ref cols -> 0.5
    # row1: all-nan ref row skipped
    assert acc == pytest.approx(0.5)
    v4 = label_accuracy_v4(hyp, ref)
    acc_pos, p_pos, r_pos, f_pos = v4["positive"]
    # positive indicators: ref [[1,0,0],[0,0,0]], hyp [[1,0,0],[1,0,0]]
    assert acc_pos == pytest.approx(5 / 6)
    assert p_pos == pytest.approx(0.5) and r_pos == pytest.approx(1.0)
