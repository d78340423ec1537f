"""Learning-dynamics proof (VERDICT r3 item 4): every workload, driven
through its real CLI on the structured synthetic corpus, optimizes to its
overfit target — not just step parity at init.  Thin wrapper over
``tools/overfit.py`` (one command reproduces this by hand:
``python tools/overfit.py``); budgets/targets live there.

The pretrain budget is large because ITM is a cross-modal equality test
that plateaus at chance for hundreds of steps (the REFERENCE's own torch
CXRBERT plateaus identically on this corpus — control in DESIGN.md §9);
it cracks only after co-trained MLM shapes class-separable features.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(workloads: str, tmp_path, timeout: int):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "overfit.py"),
         "--workloads", workloads, "--root", str(tmp_path / "ov")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, timeout=timeout)
    rows = [json.loads(line) for line in r.stdout.splitlines()
            if line.startswith("{")]
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert len(rows) == len(workloads.split(","))
    for row in rows:
        assert row["ok"], row
    return rows


def test_overfit_classify_retrieve(tmp_path):
    _run("classify,retrieve", tmp_path, timeout=2400)


def test_overfit_pretrain(tmp_path):
    rows = _run("pretrain", tmp_path, timeout=3600)
    assert rows[0]["detail"]["mlm_acc"] > 0.9, rows


def test_overfit_finetune_decode(tmp_path):
    _run("finetune", tmp_path, timeout=2400)
