"""Decode CLI scenario harness: one command over a scenarios JSON reproduces
the reference's evaluation artifact set (generation_decode.py:46,135-245:
scenario loop; :378,423: bootstrap resampling; :594-632: run-named BLEU CSVs
+ best-bleu tracking) on synthetic data."""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from medvill_tpu.cli import decode_main
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig)
from medvill_tpu.data.tokenization import build_vocab
from medvill_tpu.train import finetune as ft

N_REC = 4
IMG = 64
VIS = 4


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("decode_fixture")
    from PIL import Image

    words = [f"word{i}" for i in range(40)]
    vocab = build_vocab(words)
    with open(d / "vocab.txt", "w") as f:
        for tok in vocab:
            f.write(tok + "\n")
    rng = np.random.default_rng(0)
    with open(d / "Test.jsonl", "w") as f:
        for i in range(N_REC):
            img_name = f"img_{i}.jpg"
            Image.fromarray(rng.integers(0, 255, (IMG, IMG), np.uint8),
                            "L").save(d / img_name)
            rec = {"id": f"s{i}", "img": img_name,
                   "text": " ".join(rng.choice(words, 6)),
                   "label": "'Others'"}
            f.write(json.dumps(rec) + "\n")
    # a tiny finetuned checkpoint the harness can recover
    vocab_size = len(vocab)
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=vocab_size)),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=VIS,
                                 encoder="full-fiber"),
        len_vis_input=VIS, max_seq_length=24, max_pred=3, img_size=IMG)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    ckpt_lib.save(str(d / "model_a"), 0,
                  {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})})
    return str(d), vocab_size


def test_scenario_harness_artifact_set(fixture_dir, tmp_path):
    d, vocab_size = fixture_dir
    out = str(tmp_path / "out")
    scenarios = [
        {"dataset": "openi", "model_name": "s2s",
         "src_file": os.path.join(d, "Test.jsonl"),
         "model_recover_path": os.path.join(d, "model_a")},
        {"dataset": "openi", "model_name": "vlp",
         "src_file": os.path.join(d, "Test.jsonl"),
         "model_recover_path": os.path.join(d, "model_a"),
         "beam_size": 2},
    ]
    sc_path = str(tmp_path / "scenarios.json")
    with open(sc_path, "w") as f:
        json.dump(scenarios, f)

    args = decode_main.build_parser().parse_args([
        "--vocab_file", os.path.join(d, "vocab.txt"),
        "--scenarios", sc_path,
        "--output_dir", out,
        "--batch_size", "2",
        "--max_tgt_length", "4",
        "--len_vis_input", str(VIS),
        "--img_size", str(IMG),
        "--max_seq_length", "24",
        "--bert_model", "test-tiny",
        "--vocab_size", str(vocab_size),
        "--random_bootstrap_testnum", "2",
        "--bootstrap_resample", "true",
    ])
    decode_main.main(args)

    results = json.load(open(os.path.join(out, "all_results.json")))
    # 2 scenarios x 1 model x 2 bootstraps
    assert len(results) == 4
    for r in results:
        assert {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "best_bleu1",
                "run_name", "bootstrap", "dataset",
                "model_name"} <= set(r)
        # per-run artifact pair: <run>.csv + <run>_gt.csv + predictions
        assert os.path.exists(os.path.join(out, r["run_name"] + ".csv"))
        assert os.path.exists(os.path.join(out, r["run_name"] + "_gt.csv"))
        assert os.path.exists(os.path.join(
            out, r["run_name"] + "_predictions.json"))
    # greedy scenario reports ppl and is run-named with it
    s2s = [r for r in results if r["model_name"] == "s2s"]
    assert all("ppl" in r and "ppl_openi_s2s" in r["run_name"] for r in s2s)
    # beam scenario run names carry the beam size
    vlp = [r for r in results if r["model_name"] == "vlp"]
    assert all("2beam" in r["run_name"] for r in vlp)
    assert {r["bootstrap"] for r in vlp} == {1, 2}
    # best-bleu tracking is monotone nondecreasing over runs
    seen = -1.0
    for r in results:
        assert r["best_bleu1"] >= max(seen, r["Bleu_1"]) - 1e-12
        seen = max(seen, r["best_bleu1"])


def test_sample_plus_beam_rejected(fixture_dir):
    """--do_sample with --beam_size>1 must fail loudly: the reference
    samples only in its non-beam loop (model.py:1213), so silently running
    deterministic beam search would misattribute the results."""
    d, vocab_size = fixture_dir
    from medvill_tpu.data.tokenization import BertTokenizer

    args = decode_main.build_parser().parse_args([
        "--vocab_file", os.path.join(d, "vocab.txt"),
        "--src_file", os.path.join(d, "Test.jsonl"),
        "--beam_size", "2", "--do_sample", "true",
        "--bert_model", "test-tiny", "--vocab_size", str(vocab_size),
    ])
    tok = BertTokenizer.from_vocab_file(os.path.join(d, "vocab.txt"))
    with pytest.raises(ValueError, match="do_sample"):
        decode_main._decode_records(args, None, None, None, tok, [], d,
                                    None)


def test_decode_recovers_torch_finetune_bin(fixture_dir, tmp_path):
    """The reference's only published checkpoints are torch model.N.bin
    files (generation_decode.py:377-410); the CLI must decode from one."""
    import torch

    from test_torch_full_ckpt import bert_sd, np32, trunk_sd

    d, vocab_size = fixture_dir
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=vocab_size)),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=VIS,
                                 encoder="full-fiber"),
        len_vis_input=VIS, max_seq_length=24, max_pred=3, img_size=IMG)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(5)},
        jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    sd = bert_sd("", variables["params"]["bert"])
    sd.update(trunk_sd("img_encoder.",
                       variables["params"]["bert"]["img_encoder"],
                       variables["batch_stats"]["bert"]["img_encoder"]))
    sd["img_embeddings.img_embeddings.weight"] = np32(
        variables["params"]["bert"]["img_projection"]["kernel"]).T
    sd["img_embeddings.img_embeddings.bias"] = np32(
        variables["params"]["bert"]["img_projection"]["bias"])
    sd["cls.predictions.transform.dense.weight"] = np32(
        variables["params"]["cls"]["transform_dense"]["kernel"]).T
    sd["cls.predictions.transform.dense.bias"] = np32(
        variables["params"]["cls"]["transform_dense"]["bias"])
    sd["cls.predictions.transform.LayerNorm.weight"] = np32(
        variables["params"]["cls"]["transform_LayerNorm"]["scale"])
    sd["cls.predictions.transform.LayerNorm.bias"] = np32(
        variables["params"]["cls"]["transform_LayerNorm"]["bias"])
    sd["cls.predictions.bias"] = np32(
        variables["params"]["cls"]["decoder_bias"])
    bin_path = str(tmp_path / "model.0.bin")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               bin_path)

    out = str(tmp_path / "out_torch")
    args = decode_main.build_parser().parse_args([
        "--vocab_file", os.path.join(d, "vocab.txt"),
        "--src_file", os.path.join(d, "Test.jsonl"),
        "--model_recover_path", bin_path,
        "--output_dir", out,
        "--batch_size", "2",
        "--max_tgt_length", "4",
        "--len_vis_input", str(VIS),
        "--img_size", str(IMG),
        "--max_seq_length", "24",
        "--bert_model", "test-tiny",
        "--vocab_size", str(vocab_size),
    ])
    decode_main.main(args)
    results = json.load(open(os.path.join(out, "all_results.json")))
    assert len(results) == 1 and np.isfinite(results[0]["Bleu_1"])


def test_decode_covers_tail_batch(fixture_dir, tmp_path):
    """N records not divisible by the batch size: every record must still
    be decoded and scored (the reference's DataLoader has drop_last=False,
    generation_decode.py:428) — regression for a loop that skipped the
    final short batch entirely (and produced ZERO predictions when
    N < batch_size)."""
    d, vocab_size = fixture_dir
    out = str(tmp_path / "out_tail")
    common = [
        "--vocab_file", os.path.join(d, "vocab.txt"),
        "--src_file", os.path.join(d, "Test.jsonl"),
        "--model_recover_path", os.path.join(d, "model_a"),
        "--output_dir", out,
        "--max_tgt_length", "4",
        "--len_vis_input", str(VIS),
        "--img_size", str(IMG),
        "--max_seq_length", "24",
        "--bert_model", "test-tiny",
        "--vocab_size", str(vocab_size),
    ]
    # 4 records, batch 3 -> 1 full + 1 short batch; batch 8 -> one short
    for bs in ("3", "8"):
        args = decode_main.build_parser().parse_args(
            common + ["--batch_size", bs])
        decode_main.main(args)
        results = json.load(open(os.path.join(out, "all_results.json")))
        preds = json.load(open(os.path.join(
            out, results[-1]["run_name"] + "_predictions.json")))
        assert len(preds) == N_REC, (bs, len(preds))
        assert {p["image_id"] for p in preds} == {f"s{i}"
                                                  for i in range(N_REC)}
        assert results[-1]["ppl"] is not None


def test_decode_missing_checkpoint_fails_loudly(fixture_dir, tmp_path):
    """A recover path with no resolvable checkpoint must raise, not decode
    a randomly initialized model and log its BLEU as real results."""
    d, vocab_size = fixture_dir
    empty = tmp_path / "no_ckpt_here"
    empty.mkdir()
    args = decode_main.build_parser().parse_args([
        "--vocab_file", os.path.join(d, "vocab.txt"),
        "--src_file", os.path.join(d, "Test.jsonl"),
        "--model_recover_path", str(empty),
        "--output_dir", str(tmp_path / "out_err"),
        "--max_tgt_length", "4",
        "--len_vis_input", str(VIS),
        "--img_size", str(IMG),
        "--max_seq_length", "24",
        "--bert_model", "test-tiny",
        "--vocab_size", str(vocab_size),
    ])
    with pytest.raises(FileNotFoundError, match="no orbax epoch"):
        decode_main.main(args)
