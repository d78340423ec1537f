"""End-to-end smoke of the pretrain CLI at BERT-tiny scale (SURVEY.md §4:
"e2e smoke configs exercising each of the 5 entry points on synthetic JSONL
+ random images").  Runs ``pretrain_main.train(args)`` in-process for one
epoch over synthetic data and checks the artifact set: orbax checkpoint,
metrics JSONL with the reference metric keys, train.log."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _write_dataset(tmp_path, n=8, img_size=64):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    words = ["normal", "opacity", "effusion", "cardiomegaly", "lungs",
             "clear", "no", "acute", "finding", "with"]
    for i in range(n):
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 255, (img_size, img_size),
                                     dtype=np.uint8), mode="L").save(p)
        rows.append({"id": f"s{i}", "split": "train",
                     "label": "'Normal'" if i % 2 else "'Opacity'",
                     "text": " ".join(rng.choice(words, 6).tolist()),
                     "img": str(p)})
    train = tmp_path / "train.jsonl"
    with open(train, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    vocab = tmp_path / "vocab.txt"
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    with open(vocab, "w") as f:
        for w in specials + words:
            f.write(w + "\n")
    return str(train), str(vocab)


def test_pretrain_cli_one_epoch(tmp_path):
    from medvill_tpu.cli import pretrain_main

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out"
    args = pretrain_main.build_parser().parse_args([
        "--train_dataset", train, "--vocab_file", vocab,
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--epochs", "1", "--batch_size", "8",
        "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "1", "--num_workers", "0",
    ])
    pretrain_main.train(args)

    # artifact set: checkpoint for epoch 0, metrics jsonl, train log
    from medvill_tpu.core import checkpoint as ckpt_lib

    assert ckpt_lib.latest_epoch(str(out)) == 0
    metrics_path = os.path.join(str(out), "metrics.jsonl")
    assert os.path.exists(metrics_path)
    rows = [json.loads(l) for l in open(metrics_path)]
    assert rows, "no metrics logged"
    keys = set().union(*[set(r) for r in rows])
    # reference metric names (train_origin.py:150-169 wandb keys)
    assert any("loss" in k for k in keys), keys
    finite = [v for r in rows for k, v in r.items()
              if isinstance(v, (int, float)) and "loss" in k]
    assert finite and all(np.isfinite(finite)), rows
    assert os.path.exists(os.path.join(str(out), "train.log"))


def test_pretrain_cli_tensor_parallel(tmp_path):
    """--model_parallel 2: same CLI path over a (data, model) mesh with the
    joint encoder TP-sharded (core/mesh.py::tp_shard); must train an epoch
    and checkpoint like the data-parallel run."""
    from medvill_tpu.cli import pretrain_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out_tp"
    args = pretrain_main.build_parser().parse_args([
        "--train_dataset", train, "--vocab_file", vocab,
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--epochs", "1", "--batch_size", "8",
        "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "7",
        # accum=2 composes optax.MultiSteps with TP: its acc_grads mirror
        # the param paths, so the same tp_spec rules shard them
        "--gradient_accumulation_steps", "2", "--num_workers", "0",
        "--model_parallel", "2",
    ])
    pretrain_main.train(args)
    assert ckpt_lib.latest_epoch(str(out)) == 0
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [v for r in rows for k, v in r.items()
              if isinstance(v, (int, float)) and "loss" in k]
    assert losses and all(np.isfinite(losses)), rows


def test_pretrain_cli_zero1(tmp_path):
    """--zero1 composed with --model_parallel 2 and grad accumulation: the
    full placement stack (tp_spec params + data-sharded Adam moments via
    core/mesh.py::zero1_shard, optax.MultiSteps acc_grads on the base
    placement) must train an epoch and checkpoint."""
    from medvill_tpu.cli import pretrain_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out_z1"
    args = pretrain_main.build_parser().parse_args([
        "--train_dataset", train, "--vocab_file", vocab,
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--epochs", "1", "--batch_size", "8",
        "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "2", "--num_workers", "0",
        "--model_parallel", "2", "--zero1", "true",
    ])
    pretrain_main.train(args)
    assert ckpt_lib.latest_epoch(str(out)) == 0
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [v for r in rows for k, v in r.items()
              if isinstance(v, (int, float)) and "loss" in k]
    assert losses and all(np.isfinite(losses)), rows


def test_pretrain_cli_zero1_checkpoint_roundtrip(tmp_path):
    """A checkpoint written from a zero1+TP-SHARDED state must restore into
    a fresh run (the CLI restores on host, then re-places — so the orbax
    tree written from sharded arrays has to read back into unplaced ones)."""
    from medvill_tpu.cli import pretrain_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path)
    out1, out2 = tmp_path / "z1_a", tmp_path / "z1_b"
    base = [
        "--train_dataset", train, "--vocab_file", vocab,
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--epochs", "1", "--batch_size", "8", "--num_image_embeds", "3",
        "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "1", "--num_workers", "0",
        "--model_parallel", "2", "--zero1", "true",
    ]
    pretrain_main.train(pretrain_main.build_parser().parse_args(
        base + ["--output_path", str(out1)]))
    assert ckpt_lib.latest_epoch(str(out1)) == 0
    # second run: weight_load from the sharded-save checkpoint
    pretrain_main.train(pretrain_main.build_parser().parse_args(
        base + ["--output_path", str(out2), "--weight_load", "true",
                "--pre_trained_model_path", str(out1)]))
    assert ckpt_lib.latest_epoch(str(out2)) == 0
    log = open(os.path.join(str(out2), "train.log")).read()
    assert "restored checkpoint epoch 0" in log, log


def test_pretrain_cli_short_epoch_multi_dispatch(tmp_path):
    """An epoch with fewer batches than --steps_per_dispatch must still
    train (the tail batches flow through the single-step path) instead of
    silently dropping the whole epoch."""
    from medvill_tpu.cli import pretrain_main

    train, vocab = _write_dataset(tmp_path)  # 8 records -> 1 batch/epoch
    out = tmp_path / "out"
    args = pretrain_main.build_parser().parse_args([
        "--train_dataset", train, "--vocab_file", vocab,
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--epochs", "1", "--batch_size", "8",
        "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "1", "--num_workers", "2",
        "--steps_per_dispatch", "4",
    ])
    pretrain_main.train(args)
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [v for r in rows for k, v in r.items() if k == "avg_loss"]
    assert losses and all(np.isfinite(losses)), rows


def test_pretrain_cli_weight_load_torch_pth(tmp_path):
    """--weight_load with the published torch CXRBERT pretrain .pth: the
    reference restarts pretraining via CXRBERT.from_pretrained
    (main_origin.py:106-115); a bad path must fail loudly, not silently
    train from random init."""
    import jax
    import pytest
    import torch

    from test_torch_full_ckpt import cxrbert_pretrain_sd
    from medvill_tpu.cli import pretrain_main
    from medvill_tpu.core import checkpoint as ckpt_lib
    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.train.pretrain import init_state

    pcfg = PretrainConfig(
        seq_len=7, bert=BertConfig.test_tiny(vocab_size=32),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3,
                                 encoder="full-fiber"),
        batch_size=2, use_flash_attention=False)
    _, src = init_state(pcfg, jax.random.PRNGKey(3))
    pth = str(tmp_path / "pytorch_model.pth")
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in cxrbert_pretrain_sd(src).items()}, pth)

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out_torch_restart"
    base = [
        "--train_dataset", train, "--vocab_file", vocab,
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--epochs", "1", "--batch_size", "8", "--num_image_embeds", "3",
        "--img_size", "64", "--seq_len", "7",
        "--gradient_accumulation_steps", "1", "--num_workers", "0",
        "--weight_load", "true",
    ]
    pretrain_main.train(pretrain_main.build_parser().parse_args(
        base + ["--output_path", str(out),
                "--pre_trained_model_path", pth]))
    assert ckpt_lib.latest_epoch(str(out)) == 0
    log = open(os.path.join(str(out), "train.log")).read()
    assert "restored torch pretrain checkpoint" in log, log
    # saved word embeddings start from the .pth values (one tiny epoch
    # moves them negligibly vs a fresh random init)
    saved = ckpt_lib.restore(str(out), 0, None)
    got = np.asarray(saved["params"]["enc"]["embeddings"]
                     ["word_embeddings"]["embedding"])
    want = np.asarray(src.params["enc"]["embeddings"]
                      ["word_embeddings"]["embedding"])
    assert np.abs(got - want).max() < 1e-2

    with pytest.raises(FileNotFoundError, match="no orbax epoch"):
        pretrain_main.train(pretrain_main.build_parser().parse_args(
            base + ["--output_path", str(tmp_path / "out_err"),
                    "--pre_trained_model_path",
                    str(tmp_path / "nonexistent_dir")]))
