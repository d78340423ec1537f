"""Prepare MIMIC-CXR into the JSONL files every trainer consumes.

The reference repo ships no data-prep source at all — its only prep artifact
is the compiled report-section splitter
(``data_parsing/__pycache__/section_parser.cpython-36.pyc``; SURVEY.md §0),
and its README just names the expected files (Train.jsonl etc.).  This tool
is the missing front half of that pipeline: it walks the public MIMIC-CXR
distribution (reports tree + JPG tree + the three official CSVs) and emits
``{id, split, label, text, img}`` records in the exact format the datasets
read (data/pretrain.py:9, reference dataset_origin.py:80-181):

- ``text``: the report reduced by the recovered section splitter
  (data/section_parser.py — impression > findings > last_paragraph >
  comparison, study-specific overrides applied); studies where no section
  survives are skipped, as are empty texts.
- ``label``: comma-space-joined quoted CheXpert positives, e.g.
  ``"'Atelectasis', 'Cardiomegaly'"`` (the format the classification label
  scan splits on ", " — mmbt/data/helpers.py:32-45 — and the
  label-conditioned ITM/retrieval samplers fuzzy-match,
  dataset_origin.py:211-229).  Studies with no positive get ``""`` (the
  readers map that to ``'Others'``: mmbt/data/dataset.py:56-64).
- ``img``: path to the study's JPG, relative to ``--out_dir`` (every
  consumer — CXRPretrainDataset, CXRRetrievalDataset, the decode CLI —
  resolves relative paths against the JSONL's own directory) unless
  ``--absolute_img_paths``.
- ``split``: train/valid/test (the official CSV says "validate"; the
  reference's file naming uses Valid — both spellings accepted on read).

Usage:
  python tools/prepare_mimic.py \
      --reports_root .../mimic-cxr-reports/files \
      --images_root  .../mimic-cxr-jpg/2.0.0/files \
      --metadata_csv .../mimic-cxr-2.0.0-metadata.csv.gz \
      --chexpert_csv .../mimic-cxr-2.0.0-chexpert.csv.gz \
      --split_csv    .../mimic-cxr-2.0.0-split.csv.gz \
      --out_dir data_prepared
"""
from __future__ import annotations

import argparse
import csv
import gzip
import io
import json
import os
import sys
from typing import Dict, Iterable, List, Optional, Tuple

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from medvill_tpu.data.section_parser import extract_report_text  # noqa: E402

# the 14 CheXpert observation columns, official order
CHEXPERT_LABELS = (
    "Atelectasis", "Cardiomegaly", "Consolidation", "Edema",
    "Enlarged Cardiomediastinum", "Fracture", "Lung Lesion", "Lung Opacity",
    "No Finding", "Pleural Effusion", "Pleural Other", "Pneumonia",
    "Pneumothorax", "Support Devices")

_SPLIT_NAMES = {"train": "train", "validate": "valid", "valid": "valid",
                "val": "valid", "test": "test"}


def _open_csv(path: str) -> Iterable[Dict[str, str]]:
    """DictReader over a plain or gzipped CSV."""
    if path.endswith(".gz"):
        f = io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    else:
        f = open(path, encoding="utf-8")
    with f:
        yield from csv.DictReader(f)


def _label_string(row: Dict[str, str], uncertain_positive: bool) -> str:
    """Quoted, comma-space-joined positives (value 1.0; -1.0 too when
    ``uncertain_positive``), in official column order."""
    out: List[str] = []
    for name in CHEXPERT_LABELS:
        v = (row.get(name) or "").strip()
        if v in ("1.0", "1") or (uncertain_positive and v in ("-1.0", "-1")):
            out.append(f"'{name}'")
    return ", ".join(out)


def load_tables(metadata_csv: str, chexpert_csv: str, split_csv: str,
                views: Optional[Tuple[str, ...]],
                uncertain_positive: bool = False):
    """Returns (dicoms, labels): per-dicom (subject, study, split) rows
    filtered to the requested ViewPositions, and per-study label strings."""
    keep_view: Dict[str, bool] = {}
    if views:
        wanted = {v.strip().upper() for v in views}
        for row in _open_csv(metadata_csv):
            keep_view[row["dicom_id"]] = \
                (row.get("ViewPosition") or "").strip().upper() in wanted
    labels: Dict[Tuple[str, str], str] = {}
    for row in _open_csv(chexpert_csv):
        labels[(row["subject_id"], row["study_id"])] = _label_string(
            row, uncertain_positive)
    dicoms: List[Tuple[str, str, str, str]] = []
    for row in _open_csv(split_csv):
        d = row["dicom_id"]
        if views and not keep_view.get(d, False):
            continue
        split = _SPLIT_NAMES.get(row["split"].strip().lower())
        if split is None:
            continue
        dicoms.append((d, row["subject_id"], row["study_id"], split))
    return dicoms, labels


def study_paths(subject_id: str, study_id: str) -> Tuple[str, str]:
    """MIMIC-CXR tree layout: files/p10/p10000032/s50414267[.txt|/]"""
    p = f"p{subject_id}"
    return (os.path.join(p[:3], p, f"s{study_id}.txt"),
            os.path.join(p[:3], p, f"s{study_id}"))


def prepare(args) -> Dict[str, int]:
    views = (tuple(v for v in args.views.split(",") if v)
             if args.views else None)
    dicoms, labels = load_tables(args.metadata_csv, args.chexpert_csv,
                                 args.split_csv, views,
                                 args.uncertain_positive)
    os.makedirs(args.out_dir, exist_ok=True)
    writers = {s: open(os.path.join(args.out_dir, f"{n}.jsonl"), "w",
                       encoding="utf-8")
               for s, n in (("train", "Train"), ("valid", "Valid"),
                            ("test", "Test"))}
    counts = {"train": 0, "valid": 0, "test": 0, "no_text": 0,
              "no_report": 0, "no_image": 0}
    text_cache: Dict[str, Optional[str]] = {}
    try:
        for dicom_id, subject_id, study_id, split in dicoms:
            rel_txt, rel_img_dir = study_paths(subject_id, study_id)
            txt_path = os.path.join(args.reports_root, rel_txt)
            if txt_path not in text_cache:
                if not os.path.exists(txt_path):
                    text_cache[txt_path] = None
                else:
                    with open(txt_path, encoding="utf-8") as f:
                        text_cache[txt_path] = extract_report_text(
                            f.read(), f"s{study_id}")
            text = text_cache[txt_path]
            if text is None:
                counts["no_report"] += 1
                continue
            text = " ".join(text.split())
            if not text:
                counts["no_text"] += 1
                continue
            rel_img = os.path.join(rel_img_dir, f"{dicom_id}{args.img_ext}")
            abs_img = os.path.join(args.images_root, rel_img)
            if args.require_image and not os.path.exists(abs_img):
                counts["no_image"] += 1
                continue
            record = {
                "id": dicom_id,
                "split": split,
                "label": labels.get((subject_id, study_id), ""),
                "text": text,
                # relative paths must be relative to the JSONL's own
                # directory: that is what every reader joins against
                # (data/pretrain.py, data/retrieval.py, cli/decode_main.py)
                "img": (abs_img if args.absolute_img_paths
                        else os.path.relpath(abs_img, args.out_dir)),
            }
            writers[split].write(json.dumps(record, ensure_ascii=False)
                                 + "\n")
            counts[split] += 1
    finally:
        for w in writers.values():
            w.close()
    return counts


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--reports_root", required=True,
                   help="mimic-cxr-reports files/ root (contains p10/...)")
    p.add_argument("--images_root", required=True,
                   help="mimic-cxr-jpg files/ root (contains p10/...)")
    p.add_argument("--metadata_csv", required=True,
                   help="mimic-cxr-2.0.0-metadata.csv[.gz]")
    p.add_argument("--chexpert_csv", required=True,
                   help="mimic-cxr-2.0.0-chexpert.csv[.gz]")
    p.add_argument("--split_csv", required=True,
                   help="mimic-cxr-2.0.0-split.csv[.gz]")
    p.add_argument("--out_dir", default="data_prepared")
    p.add_argument("--views", default="AP,PA",
                   help="comma-separated ViewPositions to keep (frontal "
                        "AP,PA by default — the views MedViLL trains on); "
                        "empty keeps every view")
    p.add_argument("--img_ext", default=".jpg")
    p.add_argument("--uncertain_positive", action="store_true",
                   help="treat CheXpert -1.0 (uncertain) as positive in the "
                        "label string (U-Ones convention)")
    p.add_argument("--absolute_img_paths", action="store_true",
                   help="write absolute img paths instead of "
                        "images_root-relative ones")
    from medvill_tpu.cli import str2bool

    p.add_argument("--require_image", type=str2bool, default=True,
                   help="skip records whose JPG is missing on disk "
                        "(default true)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    counts = prepare(args)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
