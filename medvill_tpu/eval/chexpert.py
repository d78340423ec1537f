"""Clinical-accuracy evaluation of generated reports.

Compares CheXpert-labeler CSV outputs for generated vs ground-truth reports
(reference: sc/report_label_eval.py; duplicated in sc/bleu.py:68-213).
The labeler emits one row per report with 14 observation columns valued in
{1.0 (positive), 0.0 (negative), -1.0 (uncertain), blank (unmentioned)}.

Implemented natively on the csv module + numpy (no pandas/sklearn dependency
needed at runtime; pandas is used only if available for convenience).

- `label_accuracy_v2`: per-row fraction of columns agreeing with the
  reference, ignoring rows with all-14 blanks, denominated by the number of
  non-blank reference columns (report_label_eval.py:61-73).
- `label_accuracy_v4`: micro accuracy/precision/recall/F1 for the
  positive / negative / uncertain indicator matrices and their union
  (report_label_eval.py:133-183).
"""
from __future__ import annotations

import csv
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CHEXPERT_COLUMNS = [
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly",
    "Lung Lesion", "Lung Opacity", "Edema", "Consolidation", "Pneumonia",
    "Atelectasis", "Pneumothorax", "Pleural Effusion", "Pleural Other",
    "Fracture", "Support Devices",
]


def read_labeler_csv(path: str) -> np.ndarray:
    """CheXpert-labeler CSV -> [N, 14] float array with NaN for blanks.
    First column is the report text ('Reports'); the rest are observations."""
    rows: List[List[float]] = []
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        n_cols = len(header) - 1
        for row in reader:
            vals = []
            for cell in row[1:1 + n_cols]:
                cell = cell.strip()
                vals.append(float(cell) if cell else np.nan)
            rows.append(vals)
    return np.asarray(rows, dtype=np.float64)


def _micro_prf(ref: np.ndarray, hyp: np.ndarray) -> Tuple[float, float, float]:
    tp = float((ref.astype(bool) & hyp.astype(bool)).sum())
    fp = float((~ref.astype(bool) & hyp.astype(bool)).sum())
    fn = float((ref.astype(bool) & ~hyp.astype(bool)).sum())
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) else 0.0)
    return precision, recall, f1


def label_accuracy_v2(hyp: np.ndarray, ref: np.ndarray
                      ) -> Tuple[float, np.ndarray]:
    """(reference: report_label_eval.py:61-73).  NaN == NaN counts as a
    match, like pandas (df_hyp == df_ref) treats equal-position NaNs as
    False... note: pandas `==` yields False for NaN pairs, so a blank in
    both columns does NOT count as agreement — we reproduce that."""
    agree = (hyp == ref)  # NaN == NaN -> False, matching pandas
    n_cols = ref.shape[1]
    accs = []
    for i in range(ref.shape[0]):
        n_nan = int(np.isnan(ref[i]).sum())
        if n_nan == n_cols:
            continue
        accs.append(agree[i].sum() / (n_cols - n_nan))
    acc_array = np.asarray(accs)
    return float(acc_array.mean()) if len(acc_array) else 0.0, acc_array


def label_accuracy_v4(hyp: np.ndarray, ref: np.ndarray) -> Dict[str, tuple]:
    """(reference: report_label_eval.py:133-183).  Returns micro
    (accuracy, precision, recall, f1) for positive/negative/uncertain/all."""
    out = {}
    indicators = {
        "positive": 1.0, "negative": 0.0, "uncertain": -1.0,
    }
    mats = {}
    for name, val in indicators.items():
        h = (hyp == val).astype(int)
        r = (ref == val).astype(int)
        mats[name] = (r, h)
    mats["all"] = (sum(m[0] for m in mats.values()),
                   sum(m[1] for m in mats.values()))
    for name, (r, h) in mats.items():
        acc = float((r == h).sum()) / r.size
        p, rec, f1 = _micro_prf(r, h)
        out[name] = (acc, p, rec, f1)
    return out


def evaluate_reports(hypothesis_csv: str, reference_csv: str) -> dict:
    hyp = read_labeler_csv(hypothesis_csv)
    ref = read_labeler_csv(reference_csv)
    acc_v2, _ = label_accuracy_v2(hyp, ref)
    v4 = label_accuracy_v4(hyp, ref)
    return {"acc_v2": acc_v2, "v4": v4}
