"""End-to-end smoke of the report-generation finetune CLI at tiny scale
(SURVEY.md §4 entry-point smoke), including the --relax_projection path —
which exercises task_idx flowing loader -> batch filter -> MLM head."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _write_dataset(tmp_path, n=8, img_size=64):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    words = ["heart", "size", "normal", "lungs", "clear", "effusion",
             "right", "left", "small", "seen"]
    rows = []
    for i in range(n):
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 255, (img_size, img_size),
                                     dtype=np.uint8), mode="L").save(p)
        rows.append({"id": f"r{i}", "text": " ".join(
            rng.choice(words, 7).tolist()), "img": str(p)})
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


def test_finetune_cli_one_epoch_with_relax(tmp_path):
    from medvill_tpu.cli import finetune_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out_ft"
    args = finetune_main.build_parser().parse_args([
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", str(out),
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", "1",
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "16", "--max_pred", "4", "--max_len_b", "8",
        "--relax_projection",
    ])
    finetune_main.main(args)

    assert ckpt_lib.latest_epoch(str(out)) == 0
    assert os.path.exists(os.path.join(str(out), "opt.json"))
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(losses)), rows


def test_finetune_cli_multi_step_dispatch(tmp_path):
    """--steps_per_dispatch 2: the k-micro-steps lax.scan path INCLUDING an
    epoch tail (40 samples / batch 8 = 5 batches -> 2 grouped dispatches +
    1 tail batch through the single-step path; batch 8 divides the test
    mesh's 8 virtual devices)."""
    from medvill_tpu.cli import finetune_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path, n=40)
    out = tmp_path / "out_ft_k"
    args = finetune_main.build_parser().parse_args([
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", str(out),
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", "1",
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "16", "--max_pred", "4", "--max_len_b", "8",
        "--steps_per_dispatch", "2",
    ])
    finetune_main.main(args)

    assert ckpt_lib.latest_epoch(str(out)) == 0
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(losses)), rows


def test_finetune_cli_tensor_parallel(tmp_path):
    """--model_parallel 2: the finetune step over a (data, model) mesh with
    the VLP encoder TP-sharded (core/mesh.py::tp_shard)."""
    from medvill_tpu.cli import finetune_main
    from medvill_tpu.core import checkpoint as ckpt_lib

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out_tp"
    args = finetune_main.build_parser().parse_args([
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", str(out),
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", "1",
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "16", "--max_pred", "4", "--max_len_b", "8",
        "--model_parallel", "2",
    ])
    finetune_main.main(args)
    assert ckpt_lib.latest_epoch(str(out)) == 0
    rows = [json.loads(l)
            for l in open(os.path.join(str(out), "metrics.jsonl"))]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(losses)), rows


def test_finetune_cli_recovers_torch_pretrain_pth(tmp_path):
    """--model_recover_path pointing at a torch *pretrain* .pth (the
    published MedViLL checkpoint format): the CLI must ingest it with the
    enc.->bert., mlm.->cls. remap (reference finetune.py:330-357), not
    silently train from random init."""
    import jax
    import torch

    from test_torch_full_ckpt import cxrbert_pretrain_sd
    from medvill_tpu.cli import finetune_main
    from medvill_tpu.core import checkpoint as ckpt_lib
    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.train.pretrain import init_state

    pcfg = PretrainConfig(
        seq_len=16, bert=BertConfig.test_tiny(vocab_size=32),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3,
                                 encoder="full-fiber"),
        batch_size=2, use_flash_attention=False)
    _, src = init_state(pcfg, jax.random.PRNGKey(7))
    # plant a sentinel in the trunk BN running mean: fresh init is zeros,
    # so transfer is otherwise unobservable through a training epoch
    bn1 = src.batch_stats["enc"]["img_encoder"]["bn1"]
    bn1["mean"] = np.full_like(np.asarray(bn1["mean"]), 5.0)
    sd = cxrbert_pretrain_sd(src)
    pth = str(tmp_path / "pretrain_model.50.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)

    train, vocab = _write_dataset(tmp_path)
    out = tmp_path / "out_ft_pth"
    args = finetune_main.build_parser().parse_args([
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", str(out),
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", "1",
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "16", "--max_pred", "4", "--max_len_b", "8",
        "--model_recover_path", pth,
    ])
    finetune_main.main(args)

    assert ckpt_lib.latest_epoch(str(out)) == 0
    saved = ckpt_lib.restore(str(out), 0, None)
    # the transferred word embeddings must start from the pretrain values
    # (one tiny-lr epoch moves them negligibly vs a fresh random init)
    got = np.asarray(saved["params"]["bert"]["embeddings"]
                     ["word_embeddings"]["embedding"])
    want = np.asarray(src.params["enc"]["embeddings"]
                      ["word_embeddings"]["embedding"])
    assert np.abs(got - want).max() < 1e-2, np.abs(got - want).max()
    # trunk BN running stats transferred too (the only trunk state the
    # frozen-trunk pretrain updates): one train epoch decays the sentinel
    # toward the batch mean (new = m*5.0 + (1-m)*batch), so the saved mean
    # stays far above the ~0 it would be had batch_stats been dropped
    got_bn = np.asarray(saved["batch_stats"]["bert"]["img_encoder"]
                        ["bn1"]["mean"])
    assert got_bn.mean() > 2.0, got_bn.mean()


def test_finetune_cli_missing_recover_fails_loudly(tmp_path):
    from medvill_tpu.cli import finetune_main

    train, vocab = _write_dataset(tmp_path)
    empty = tmp_path / "no_ckpt"
    empty.mkdir()
    args = finetune_main.build_parser().parse_args([
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", str(tmp_path / "out_err"),
        "--bert_model", "test-tiny", "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", "1",
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "16", "--max_pred", "4", "--max_len_b", "8",
        "--model_recover_path", str(empty),
    ])
    with pytest.raises(FileNotFoundError, match="no orbax epoch"):
        finetune_main.main(args)


def test_expand_token_type_embeddings_reference_slots():
    """Pretrain type_vocab 2 -> VLP 6 follows the reference's slot copy
    (model.py:650-666): 2/3/4 <- pretrain slot 0, 5 <- pretrain slot 1 —
    so s2s segments start with the PRETRAINED image/text segment
    embeddings (random slots measurably class-collapse the overfit
    finetune stage).  Shrink truncates; equal shapes pass through."""
    import numpy as np

    from medvill_tpu.core.checkpoint import expand_token_type_embeddings

    src = np.arange(2 * 4, dtype=np.float32).reshape(2, 4)
    dst = np.full((6, 4), -1.0, np.float32)
    out = expand_token_type_embeddings(src, dst)
    np.testing.assert_array_equal(out[0], src[0])
    np.testing.assert_array_equal(out[1], src[1])
    for slot in (2, 3, 4):
        np.testing.assert_array_equal(out[slot], src[0])
    np.testing.assert_array_equal(out[5], src[1])
    # shrink: truncate to dst rows
    out2 = expand_token_type_embeddings(out, np.zeros((2, 4), np.float32))
    np.testing.assert_array_equal(out2, out[:2])
    # 2 < n < 6: reference leaves resize_() garbage; we keep dst's init
    out3 = expand_token_type_embeddings(src, np.full((4, 4), 7.0,
                                                     np.float32))
    np.testing.assert_array_equal(out3[:2], src)
    np.testing.assert_array_equal(out3[2:], np.full((2, 4), 7.0))


def test_merge_pretrain_expands_token_types():
    """The orbax pretrain->finetune recover path routes the 2-row
    token_type table through the reference expansion instead of silently
    leaving all 6 VLP slots random (the bug behind the finetune overfit
    class-collapse)."""
    import numpy as np

    from medvill_tpu.cli.finetune_main import _merge_pretrain

    rng = np.random.default_rng(0)
    src_tt = rng.standard_normal((2, 4)).astype(np.float32)
    restored = {"params": {"enc": {"embeddings": {
        "token_type_embeddings": {"embedding": src_tt}}}}}
    params = {"bert": {"embeddings": {
        "token_type_embeddings": {"embedding": np.zeros((6, 4),
                                                        np.float32)}}}}
    merged = _merge_pretrain(params, restored)
    got = merged["bert"]["embeddings"]["token_type_embeddings"]["embedding"]
    np.testing.assert_array_equal(got[4], src_tt[0])
    np.testing.assert_array_equal(got[5], src_tt[1])
