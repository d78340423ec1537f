"""Native ROUGE-L / CIDEr-D caption metrics (eval/caption_metrics.py) —
hand-computed oracles for the coco-caption conventions the reference's
language_eval (sc/lang_utils.py:12-60) reports through pycocoevalcap."""
import math

import pytest

from medvill_tpu.eval.caption_metrics import _lcs_len, cider_d, rouge_l
from medvill_tpu.eval.lang_utils import language_eval


def test_lcs():
    assert _lcs_len("abcde", "ace") == 3
    assert _lcs_len([], ["a"]) == 0
    assert _lcs_len(["x", "y"], ["y", "x"]) == 1


def test_rouge_identical_is_one():
    mean, per = rouge_l([["a", "b", "c"]], [[["a", "b", "c"]]])
    assert mean == pytest.approx(1.0)
    assert per == [pytest.approx(1.0)]


def test_rouge_hand_value():
    # hyp "a b c d" vs ref "a c d": lcs=3, P=3/4, R=1; beta=1.2
    # F = (1+1.44)*0.75*1 / (1 + 1.44*0.75) = 1.83/2.08
    mean, _ = rouge_l([["a", "b", "c", "d"]], [[["a", "c", "d"]]])
    assert mean == pytest.approx(1.83 / 2.08)


def test_rouge_multi_ref_takes_max_p_and_r_independently():
    # prec_max from one ref, rec_max possibly from another
    hyp = ["c", "d", "e"]
    refs = [["a", "b"], ["c", "d", "e"]]
    mean, _ = rouge_l([hyp], [refs])
    assert mean == pytest.approx(1.0)


def test_rouge_disjoint_and_empty():
    assert rouge_l([["a"]], [[["b"]]])[0] == 0.0
    assert rouge_l([[]], [[["b"]]])[0] == 0.0
    assert rouge_l([], [])[0] == 0.0


def test_cider_identical_pair_corpus():
    """hyp == ref on distinct sentences -> per-image 10.0 (max score)."""
    refs = [[["a", "b", "c", "d", "e"]], [["f", "g", "h", "i", "j"]]]
    hyps = [["a", "b", "c", "d", "e"], ["f", "g", "h", "i", "j"]]
    mean, per = cider_d(hyps, refs)
    assert per == [pytest.approx(10.0), pytest.approx(10.0)]
    assert mean == pytest.approx(10.0)


def test_cider_single_image_corpus_is_zero():
    # df == N for every reference ngram -> all TF-IDF mass vanishes
    # (coco-caption behaves identically)
    mean, per = cider_d([["a", "b"]], [[["a", "b"]]])
    assert mean == 0.0 and per == [0.0]


def test_cider_hand_value_max_n2():
    """Full hand computation at max_n=2, N=2 images, 1 ref each.

    Image 1: ref/hyp "a b" -> exact match -> 10.
    Image 2: ref "c d", hyp "c e": every ngram has df 1 (or unseen -> 1),
    so idf = log2 everywhere.  Unigrams share only 'c':
    dot = log2^2 / (log2*sqrt2 * log2*sqrt2) = 1/2; bigrams share none.
    Bigram lengths equal -> penalty 1.  Score = mean([0.5, 0]) * 10 = 2.5.
    """
    refs = [[["a", "b"]], [["c", "d"]]]
    hyps = [["a", "b"], ["c", "e"]]
    mean, per = cider_d(hyps, refs, max_n=2)
    assert per[0] == pytest.approx(10.0)
    assert per[1] == pytest.approx(2.5)
    assert mean == pytest.approx(6.25)


def test_cider_clipping_and_length_penalty():
    refs = [[["a", "b", "c", "d"]], [["w", "x", "y", "z"]]]
    exact = cider_d([["a", "b", "c", "d"], ["w", "x", "y", "z"]], refs)[0]
    # repeated-token hyp must not score above exact (TF clipped at ref TF)
    spam = cider_d([["a", "a", "a", "a"], ["w", "x", "y", "z"]], refs)[0]
    # truncated hyp pays the Gaussian bigram-length penalty
    short = cider_d([["a", "b"], ["w", "x", "y", "z"]], refs)[0]
    assert spam < exact
    assert short < exact
    # the penalty factor itself: delta = 1 bigram on image 1
    assert math.exp(-1.0 / 72.0) < 1.0


def test_language_eval_fallback_reports_reference_keys():
    preds = [{"image_id": 0, "caption": "a b c", "gt_caption": "a b c"},
             {"image_id": 1, "caption": "d e f", "gt_caption": "d e g"}]
    out = language_eval(preds)
    for key in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "CIDEr"):
        assert key in out, key
    assert 0.0 <= out["ROUGE_L"] <= 1.0
    assert 0.0 <= out["CIDEr"] <= 10.0
