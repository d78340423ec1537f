"""End-to-end smokes for the classification and retrieval CLIs at tiny
scale (SURVEY.md §4 entry-point smoke; completes the 5-entry-point matrix
with the pretrain/finetune/decode smokes)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORDS = ["no", "acute", "disease", "heart", "lungs", "clear", "mild",
         "edema", "stable", "chest"]
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def _images(tmp_path, n, img_size=64, rgb=True):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(2)
    paths = []
    for i in range(n):
        p = img_dir / f"{i}.png"
        if rgb:
            Image.fromarray(rng.integers(0, 255, (img_size, img_size, 3),
                                         dtype=np.uint8), "RGB").save(p)
        else:
            Image.fromarray(rng.integers(0, 255, (img_size, img_size),
                                         dtype=np.uint8), "L").save(p)
        paths.append(str(p))
    return paths


def _vocab(tmp_path):
    vocab = tmp_path / "vocab.txt"
    with open(vocab, "w") as f:
        for w in SPECIALS + WORDS:
            f.write(w + "\n")
    return str(vocab)


def test_classification_cli_one_epoch(tmp_path):
    from medvill_tpu.cli import classification_main

    rng = np.random.default_rng(3)
    paths = _images(tmp_path, 8)
    labels = ["Cardiomegaly", "Edema", "Others"]
    for split in ("Train.jsonl", "Valid.jsonl"):
        with open(tmp_path / split, "w") as f:
            for i, p in enumerate(paths):
                f.write(json.dumps({
                    "id": f"{split}-{i}",
                    "text": " ".join(rng.choice(WORDS, 6).tolist()),
                    "label": labels[i % 2] + ("," + labels[1] if i % 3 == 0
                                              else ""),
                    "img": p}) + "\n")
    out = tmp_path / "out_clf"
    args = classification_main.build_parser().parse_args([
        "--data_path", str(tmp_path), "--vocab_file", _vocab(tmp_path),
        "--savedir", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_sz", "8", "--max_epochs", "1",
        "--num_image_embeds", "4", "--img_size", "64",
        "--max_seq_len", "20",
    ])
    classification_main.train(args)
    run_dir = os.path.join(str(out), "clf")
    rows = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert rows, "no metrics"
    vals = [v for r in rows for k, v in r.items()
            if isinstance(v, (int, float))]
    assert vals and all(np.isfinite(vals)), rows


def test_classification_cli_single_label_mode(tmp_path):
    """--task_type classification: softmax CE + accuracy model selection
    (reference mmbt/main.py:30,92-104,147-193)."""
    from medvill_tpu.cli import classification_main

    rng = np.random.default_rng(5)
    paths = _images(tmp_path, 8)
    labels = ["Cardiomegaly", "Edema", "Others"]
    for split in ("Train.jsonl", "Valid.jsonl"):
        with open(tmp_path / split, "w") as f:
            for i, p in enumerate(paths):
                f.write(json.dumps({
                    "id": f"{split}-{i}",
                    "text": " ".join(rng.choice(WORDS, 6).tolist()),
                    "label": labels[i % 3],   # single label per row
                    "img": p}) + "\n")
    out = tmp_path / "out_clf_single"
    args = classification_main.build_parser().parse_args([
        "--data_path", str(tmp_path), "--vocab_file", _vocab(tmp_path),
        "--savedir", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_sz", "8", "--max_epochs", "1",
        "--num_image_embeds", "4", "--img_size", "64",
        "--max_seq_len", "20", "--task_type", "classification",
        "--name", "single",    # reference --name alias for the run name
    ])
    classification_main.train(args)
    run_dir = os.path.join(str(out), "single")
    rows = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    accs = [r["acc"] for r in rows if "acc" in r]
    assert accs and all(0.0 <= a <= 1.0 for a in accs), rows
    csv_rows = open(os.path.join(run_dir, "single.csv")).read().splitlines()
    assert csv_rows[0] == "acc"


def test_classification_cli_steps_per_dispatch(tmp_path):
    """--steps_per_dispatch 2: the k-micro-steps lax.scan path INCLUDING an
    epoch-tail single-step batch (3 train batches of 8 with k=2 -> one
    [2, B, ...] group + one tail; batch stays divisible by the conftest's
    8-device mesh), composed with the phase-static freeze specialization."""
    from medvill_tpu.cli import classification_main

    rng = np.random.default_rng(7)
    paths = _images(tmp_path, 24)
    labels = ["Cardiomegaly", "Edema", "Others"]
    for split in ("Train.jsonl", "Valid.jsonl"):
        with open(tmp_path / split, "w") as f:
            for i, p in enumerate(paths):
                f.write(json.dumps({
                    "id": f"{split}-{i}",
                    "text": " ".join(rng.choice(WORDS, 6).tolist()),
                    "label": labels[i % 2],
                    "img": p}) + "\n")
    out = tmp_path / "out_clf_kdisp"
    args = classification_main.build_parser().parse_args([
        "--data_path", str(tmp_path), "--vocab_file", _vocab(tmp_path),
        "--savedir", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_sz", "8", "--max_epochs", "1",
        "--num_image_embeds", "4", "--img_size", "64",
        "--max_seq_len", "20", "--steps_per_dispatch", "2",
        "--freeze_img", "1",   # freeze phase x multi-dispatch composition
        "--name", "kdisp",
    ])
    classification_main.train(args)
    run_dir = os.path.join(str(out), "kdisp")
    rows = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert losses and all(np.isfinite(losses)), rows


def test_retrieval_cli_one_epoch(tmp_path):
    from medvill_tpu.cli import retrieval_main

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
    out = tmp_path / "out_ret"
    args = retrieval_main.build_parser().parse_args([
        "--train_dataset", str(train), "--vocab_file", _vocab(tmp_path),
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_size", "4", "--epochs", "1",
        "--seq_len", "7", "--num_image_embeds", "3", "--img_size", "64",
        "--do_train", "true", "--do_test", "false",
    ])
    retrieval_main.main(args)
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    assert any("train_loss" in r for r in rows), rows
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert all(np.isfinite(losses)), rows


def test_retrieval_cli_steps_per_dispatch(tmp_path):
    """--steps_per_dispatch 2 over pos+neg pair batches: one [2, 2B, ...]
    scan group per epoch (8 examples, batch 4 -> 2 pair batches)."""
    from medvill_tpu.cli import retrieval_main

    rng = np.random.default_rng(8)
    paths = _images(tmp_path, 8)
    train = tmp_path / "ret_train.jsonl"
    with open(train, "w") as f:
        for i, p in enumerate(paths):
            f.write(json.dumps({
                "id": f"t{i}", "split": "train",
                "label": "'Normal'" if i % 2 else "'Edema'",
                "text": " ".join(rng.choice(WORDS, 5).tolist()),
                "img": p}) + "\n")
    out = tmp_path / "out_ret_kdisp"
    args = retrieval_main.build_parser().parse_args([
        "--train_dataset", str(train), "--vocab_file", _vocab(tmp_path),
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_size", "4", "--epochs", "2",
        "--seq_len", "7", "--num_image_embeds", "3", "--img_size", "64",
        "--do_train", "true", "--do_test", "false",
        "--steps_per_dispatch", "2",
    ])
    retrieval_main.main(args)
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert len(losses) == 2 and all(np.isfinite(losses)), rows


def test_retrieval_cli_cnn_bert_branch(tmp_path):
    """--CXRBERT false selects the late-fusion CNN_BERT baseline
    (reference: full_dset_retrieval.py:656,549-555)."""
    import json as json_lib

    from medvill_tpu.cli import retrieval_main

    rng = np.random.default_rng(5)
    paths = _images(tmp_path, 8)
    train = tmp_path / "ret_train.jsonl"
    with open(train, "w") as f:
        for i, p in enumerate(paths):
            f.write(json_lib.dumps({
                "id": f"t{i}", "split": "train",
                "label": "'Normal'" if i % 2 else "'Edema'",
                "text": " ".join(rng.choice(WORDS, 5).tolist()),
                "img": p}) + "\n")
    out = tmp_path / "out_cnn"
    args = retrieval_main.build_parser().parse_args([
        "--train_dataset", str(train), "--vocab_file", _vocab(tmp_path),
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_size", "4", "--epochs", "1",
        "--seq_len", "7", "--num_image_embeds", "3", "--img_size", "64",
        "--do_train", "true", "--do_test", "false", "--CXRBERT", "false",
    ])
    retrieval_main.main(args)
    rows = [json_lib.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert losses and all(np.isfinite(losses)), rows


def test_retrieval_cli_loads_torch_pretrain_checkpoint(tmp_path):
    """The published MedViLL weights are a torch CXRBERT checkpoint; the
    retrieval CLI must load one directly (reference: retrieval.py:17-24)."""
    import json as json_lib

    import jax
    import torch

    from test_torch_full_ckpt import bert_sd, np32, trunk_sd

    from medvill_tpu.cli import retrieval_main
    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.train.pretrain import init_state

    # must mirror the CLI's model config exactly
    pcfg = PretrainConfig(
        seq_len=7, bert=BertConfig.from_name("test-tiny", 32),
        image=ImageEncoderConfig(num_image_embeds=3, img_size=64))
    _, src = init_state(pcfg, jax.random.PRNGKey(3))
    sd = bert_sd("enc.", src.params["enc"])
    sd.update(trunk_sd("enc.img_encoder.",
                       src.params["enc"]["img_encoder"],
                       src.batch_stats["enc"]["img_encoder"]))
    sd["enc.img_embeddings.img_embeddings.weight"] = np32(
        src.params["enc"]["img_projection"]["kernel"]).T
    sd["enc.img_embeddings.img_embeddings.bias"] = np32(
        src.params["enc"]["img_projection"]["bias"])
    sd["itm.linear.weight"] = np32(src.params["itm"]["linear"]["kernel"]).T
    sd["itm.linear.bias"] = np32(src.params["itm"]["linear"]["bias"])
    hf_dir = tmp_path / "published"
    hf_dir.mkdir()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(hf_dir / "pytorch_model.bin"))

    rng = np.random.default_rng(6)
    paths = _images(tmp_path, 8)
    train = tmp_path / "ret_train.jsonl"
    with open(train, "w") as f:
        for i, p in enumerate(paths):
            f.write(json_lib.dumps({
                "id": f"t{i}", "split": "train",
                "label": "'Normal'" if i % 2 else "'Edema'",
                "text": " ".join(rng.choice(WORDS, 5).tolist()),
                "img": p}) + "\n")
    out = tmp_path / "out_torchload"
    args = retrieval_main.build_parser().parse_args([
        "--train_dataset", str(train), "--vocab_file", _vocab(tmp_path),
        "--output_path", str(out), "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_size", "4", "--epochs", "1",
        "--seq_len", "7", "--num_image_embeds", "3", "--img_size", "64",
        "--do_train", "true", "--do_test", "false",
        "--load_pretrained_model", str(hf_dir),
    ])
    retrieval_main.main(args)
    rows = [json_lib.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert losses and all(np.isfinite(losses)), rows


def test_classification_merge_transfers_batch_stats():
    """--loaddir merge must carry the pretrain trunk's BN running stats:
    the pretrain trunk is frozen, so those stats are the ONLY trunk state
    pretraining updates (reference mmbt/main.py:241-244 strict=False load
    includes running_mean/running_var)."""
    import numpy as np

    from medvill_tpu.cli.classification_main import _merge_pretrained

    params = {"enc": {"w": np.zeros((2, 2), np.float32)},
              "head": {"w": np.zeros((3,), np.float32)}}
    batch_stats = {"enc": {"bn1": {"mean": np.zeros((4,), np.float32),
                                   "var": np.ones((4,), np.float32)}}}
    restored = {
        "params": {"enc": {"w": np.ones((2, 2), np.float32)},
                   "mlm": {"x": np.ones((5,), np.float32)}},
        "batch_stats": {"enc": {"bn1": {
            "mean": np.full((4,), 7.0, np.float32),
            "var": np.full((4,), 3.0, np.float32)}}},
    }
    new_p, new_bs = _merge_pretrained(params, batch_stats, restored)
    assert np.allclose(new_p["enc"]["w"], 1.0)
    assert np.allclose(new_p["head"]["w"], 0.0)  # untouched
    assert np.allclose(new_bs["enc"]["bn1"]["mean"], 7.0)
    assert np.allclose(new_bs["enc"]["bn1"]["var"], 3.0)
    # no restored tree -> both returned unchanged
    same_p, same_bs = _merge_pretrained(params, batch_stats, None)
    assert same_p is params and same_bs is batch_stats
