"""label_accuracy_v3 vs a literal pandas/sklearn transcription of the
reference ``get_label_accuracy_v3`` (sc/report_label_eval.py:75-131) — the
same oracle style as tests/test_optim.py uses for BertAdam."""
import warnings

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
sk = pytest.importorskip("sklearn.metrics")

from medvill_tpu.eval.chexpert import label_accuracy_v3


def _reference_v3(df_tgt, df_ref):
    """Transcription of report_label_eval.py:75-131 (oracle only)."""
    from sklearn.metrics import (accuracy_score, precision_score,
                                 recall_score)

    positive_tgt = df_tgt.isin([1.0])
    negative_tgt = df_tgt.isin([0.0])
    ambi_tgt = df_tgt.isin([-1.0])
    positive_ref = df_ref.isin([1.0])
    negative_ref = df_ref.isin([0.0])
    ambi_ref = df_ref.isin([-1.0])
    acc_list = []
    pos_precision, neg_precision, amb_precision = [], [], []
    pos_recall, neg_recall, amb_recall = [], [], []
    all_precision_lt, all_recall_lt = [], []
    for row in range(len(df_tgt)):
        if len(positive_ref.loc[row].unique()) != 1:
            pos_precision.append(precision_score(
                positive_ref.loc[row], positive_tgt.loc[row],
                average="binary", pos_label=True, zero_division=0))
            pos_recall.append(recall_score(
                positive_ref.loc[row], positive_tgt.loc[row],
                average="binary", pos_label=True, zero_division=0))
        if len(negative_ref.loc[row].unique()) != 1:
            neg_precision.append(precision_score(
                negative_ref.loc[row], negative_tgt.loc[row],
                average="binary", pos_label=True, zero_division=0))
            neg_recall.append(recall_score(
                negative_ref.loc[row], negative_tgt.loc[row],
                average="binary", pos_label=True, zero_division=0))
        if len(ambi_ref.loc[row].unique()) != 1:
            amb_precision.append(precision_score(
                ambi_ref.loc[row], ambi_tgt.loc[row],
                average="binary", pos_label=True, zero_division=0))
            amb_recall.append(recall_score(
                ambi_ref.loc[row], ambi_tgt.loc[row],
                average="binary", pos_label=True, zero_division=0))
        acc_list.append(accuracy_score(
            df_ref.iloc[row, 1:].fillna(4).values.astype(float),
            df_tgt.iloc[row, 1:].fillna(4).values.astype(float)))
        all_precision_lt.append(precision_score(
            df_ref.iloc[row, 1:].fillna(4).values.astype(float),
            df_tgt.iloc[row, 1:].fillna(4).values.astype(float), average="macro",
            zero_division=0))
        all_recall_lt.append(recall_score(
            df_ref.iloc[row, 1:].fillna(4).values.astype(float),
            df_tgt.iloc[row, 1:].fillna(4).values.astype(float), average="macro",
            zero_division=0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return (np.mean(acc_list), np.mean(pos_precision),
                np.mean(pos_recall), np.mean(neg_precision),
                np.mean(neg_recall), np.mean(amb_precision),
                np.mean(amb_recall), np.mean(all_precision_lt),
                np.mean(all_recall_lt))


def _random_frames(n=20, seed=0):
    rng = np.random.default_rng(seed)
    cols = [f"obs{i}" for i in range(14)]

    def frame():
        vals = rng.choice([1.0, 0.0, -1.0, np.nan], size=(n, 14),
                          p=[0.25, 0.25, 0.15, 0.35])
        df = pd.DataFrame(vals, columns=cols)
        df.insert(0, "Reports", [f"report {i}" for i in range(n)])
        return df

    return frame(), frame()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_v3_matches_reference_transcription(seed):
    df_hyp, df_ref = _random_frames(seed=seed)
    want = _reference_v3(df_hyp, df_ref)
    hyp = df_hyp.drop(columns=["Reports"]).to_numpy(np.float64)
    ref = df_ref.drop(columns=["Reports"]).to_numpy(np.float64)
    got = label_accuracy_v3(hyp, ref)
    keys = ["acc", "pos_precision", "pos_recall", "neg_precision",
            "neg_recall", "amb_precision", "amb_recall", "all_precision",
            "all_recall"]
    for k, w in zip(keys, want):
        g = got[k]
        if np.isnan(w):
            assert np.isnan(g), k
        else:
            np.testing.assert_allclose(g, w, rtol=1e-9, err_msg=k)


def test_v3_all_positive_row_included():
    """A row whose reference is all-positive is still scored: the
    reference's unique() check sees the always-False 'Reports' entry."""
    ref = np.ones((1, 14))
    hyp = np.ones((1, 14))
    out = label_accuracy_v3(hyp, ref)
    assert out["pos_precision"] == 1.0 and out["pos_recall"] == 1.0
