"""tools/prepare_mimic.py: synthetic MIMIC-CXR tree -> trainer JSONL.

The reference ships no data-prep source (only the compiled section parser;
SURVEY.md §0), so these tests pin OUR contract: official CSV/tree layout in,
``{id, split, label, text, img}`` records out, readable by the pretrain
dataset and the classification label scan.
"""
import csv
import gzip
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import prepare_mimic  # noqa: E402

REPORT = """                                 FINAL REPORT
 EXAMINATION:  CHEST (PA AND LAT)

 INDICATION:  Cough.

 FINDINGS:
 The lungs are clear.  No pleural effusion.

 IMPRESSION:
 No acute cardiopulmonary process.
"""

# no impression/findings -> reduced via the last-paragraph fallback
REPORT_PREAMBLE_ONLY = """                                 FINAL REPORT
 Portable chest radiograph.
 \n Lines and tubes in standard position.
"""


def _gz_csv(path, header, rows):
    with io.TextIOWrapper(gzip.open(path, "wb"), encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _tree(tmp_path):
    reports = tmp_path / "reports"
    images = tmp_path / "images"
    # two subjects, three studies, four dicoms (one lateral to filter out)
    studies = [("10000001", "50000001", REPORT),
               ("10000001", "50000002", REPORT_PREAMBLE_ONLY),
               ("10000002", "50000003", REPORT)]
    for subj, study, text in studies:
        rel_txt, rel_dir = prepare_mimic.study_paths(subj, study)
        p = reports / rel_txt
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text)
        (images / rel_dir).mkdir(parents=True, exist_ok=True)
    dicoms = [("d1", "10000001", "50000001", "PA", "train"),
              ("d2", "10000001", "50000002", "AP", "train"),
              ("dlat", "10000001", "50000002", "LATERAL", "train"),
              ("d3", "10000002", "50000003", "PA", "validate")]
    for d, subj, study, _, _ in dicoms:
        _, rel_dir = prepare_mimic.study_paths(subj, study)
        (images / rel_dir / f"{d}.jpg").write_bytes(b"\xff\xd8fake")
    _gz_csv(tmp_path / "metadata.csv.gz",
            ["dicom_id", "subject_id", "study_id", "ViewPosition"],
            [(d, s, st, v) for d, s, st, v, _ in dicoms])
    _gz_csv(tmp_path / "split.csv.gz",
            ["dicom_id", "study_id", "subject_id", "split"],
            [(d, st, s, sp) for d, s, st, _, sp in dicoms])
    header = ["subject_id", "study_id"] + list(prepare_mimic.CHEXPERT_LABELS)
    def lab(**kw):
        return [kw.get(n, "") for n in prepare_mimic.CHEXPERT_LABELS]
    _gz_csv(tmp_path / "chexpert.csv.gz", header, [
        ["10000001", "50000001"] + lab(**{"No Finding": "1.0"}),
        ["10000001", "50000002"] + lab(**{"Edema": "1.0",
                                          "Cardiomegaly": "-1.0"}),
        ["10000002", "50000003"] + lab(**{"Atelectasis": "1.0",
                                          "Pleural Effusion": "1.0"}),
    ])
    return reports, images


def _run(tmp_path, extra=()):
    reports, images = _tree(tmp_path)
    out = tmp_path / "out"
    prepare_mimic.main([
        "--reports_root", str(reports), "--images_root", str(images),
        "--metadata_csv", str(tmp_path / "metadata.csv.gz"),
        "--chexpert_csv", str(tmp_path / "chexpert.csv.gz"),
        "--split_csv", str(tmp_path / "split.csv.gz"),
        "--out_dir", str(out), *extra])
    rows = {}
    for name in ("Train", "Valid", "Test"):
        with open(out / f"{name}.jsonl") as f:
            rows[name] = [json.loads(l) for l in f]
    return rows


def test_records_splits_labels_and_view_filter(tmp_path):
    rows = _run(tmp_path)
    train, valid, test = rows["Train"], rows["Valid"], rows["Test"]
    assert [r["id"] for r in train] == ["d1", "d2"]   # LATERAL filtered out
    assert [r["id"] for r in valid] == ["d3"]
    assert test == []
    by_id = {r["id"]: r for r in train + valid}
    assert by_id["d1"]["label"] == "'No Finding'"
    assert by_id["d2"]["label"] == "'Edema'"          # -1.0 not positive
    assert by_id["d3"]["label"] == "'Atelectasis', 'Pleural Effusion'"
    # impression preferred over findings
    assert by_id["d1"]["text"] == "No acute cardiopulmonary process."
    # preamble-only report reduced via the last-paragraph fallback
    assert by_id["d2"]["text"] == "Lines and tubes in standard position."
    assert by_id["d3"]["split"] == "valid"
    # relative img path resolves inside the images root
    rel = by_id["d1"]["img"]
    assert not os.path.isabs(rel) and rel.endswith("d1.jpg")


def test_uncertain_positive_and_absolute_paths(tmp_path):
    rows = _run(tmp_path, extra=("--uncertain_positive",
                                 "--absolute_img_paths"))
    by_id = {r["id"]: r for r in rows["Train"] + rows["Valid"]}
    assert by_id["d2"]["label"] == "'Cardiomegaly', 'Edema'"
    assert os.path.isabs(by_id["d1"]["img"])
    assert os.path.exists(by_id["d1"]["img"])


def test_output_feeds_the_trainers(tmp_path):
    """The emitted records satisfy the pretrain dataset's record contract
    and the classification label scan (data/pretrain.py:9,
    mmbt/data/helpers.py:32-45)."""
    from medvill_tpu.data.classification import get_labels_and_frequencies

    rows = _run(tmp_path)
    labels, freqs = get_labels_and_frequencies(rows["Train"])
    assert set(labels) == {"'No Finding'", "'Edema'"}
    assert all(set(r) == {"id", "split", "label", "text", "img"}
               for r in rows["Train"])
    assert all(np.array([freqs[l] for l in labels]) > 0)
