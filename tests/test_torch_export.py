"""Torch checkpoint EXPORT round-trips (core/torch_export.py).

The inverse of the ingestion shims: a param tree exported to the reference's
state_dict layout and re-ingested through the (torch-parity-tested) import
path must reproduce the original tree bit-for-bit.  This proves a checkpoint
trained here loads into the reference's own scripts — CXRBERT.from_pretrained
(retrieval.py:17-24), finetune --model_recover_path (sc/finetune.py:330-357),
decode recover (generation_decode.py:377-410).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core import torch_export, torch_init
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig, PretrainConfig)
from medvill_tpu.train import finetune as ft
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import TrainState, init_state


def _assert_trees_equal(got, want, where=""):
    got_flat = jax.tree_util.tree_leaves_with_path(got)
    want_map = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(got_flat) == len(want_map), where
    for path, leaf in got_flat:
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(want_map[path],
                                                     np.float32),
            err_msg=where + jax.tree_util.keystr(path))


def _tiny_pretrain_state(seed: int):
    cfg = PretrainConfig(
        batch_size=2, seq_len=7,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3))
    _, state = init_state(cfg, jax.random.PRNGKey(seed), optim.adamw(1e-3))
    return cfg, state


def _tiny_vlp_state(seed: int, task: str = "report_generation"):
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=32)),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        len_vis_input=4, max_len_b=10, max_seq_length=24, max_pred=3,
        img_size=64, task=task)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, jnp.zeros((2, 64, 64, 3)),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    return cfg, variables["params"], variables.get("batch_stats", {})


@pytest.mark.slow
def test_cxrbert_export_roundtrip(tmp_path):
    _, state = _tiny_pretrain_state(0)
    sd = torch_export.export_cxrbert_state_dict(
        jax.device_get(state.params), jax.device_get(state.batch_stats))
    # the layout the published weights use (cxrbert_origin.py:132-149)
    assert "enc.txt_embeddings.word_embeddings.weight" in sd
    assert "enc.img_encoder.model.0.weight" in sd
    assert "enc.encoder.layer.0.attention.self.query.weight" in sd
    assert "mlm.predictions.transform.dense.weight" in sd
    assert "mlm.predictions.decoder.weight" in sd  # tied table materialized
    assert "itm.linear.weight" in sd
    path = os.path.join(tmp_path, "pytorch_model.bin")
    torch_export.save_torch_checkpoint(sd, path)

    # re-ingest into a DIFFERENTLY-initialized tree: every leaf must come
    # back bit-identical to the exported state
    _, other = _tiny_pretrain_state(1)
    new_params, new_bs = torch_init.init_cxrbert_from_torch(
        jax.device_get(other.params), jax.device_get(other.batch_stats), path)
    _assert_trees_equal(new_params, jax.device_get(state.params), "params")
    _assert_trees_equal(new_bs, jax.device_get(state.batch_stats),
                        "batch_stats")


@pytest.mark.slow
@pytest.mark.parametrize("task", ["report_generation", "vqa"])
def test_vlp_export_roundtrip(tmp_path, task):
    _, params, batch_stats = _tiny_vlp_state(0, task=task)
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)
    sd = torch_export.export_vlp_state_dict(params, batch_stats)
    # finetune save layout: top-level module names (model.py:903-927)
    assert "txt_embeddings.word_embeddings.weight" in sd
    assert "img_encoder.model.4.0.conv1.weight" in sd
    if task == "report_generation":
        # the report-gen init path applies the MLM head; VQA's applies the
        # answer classifier instead (flax creates params lazily on first use)
        assert "cls.predictions.bias" in sd
    else:
        assert "ans_classifier.0.weight" in sd
    path = os.path.join(tmp_path, "model.3.bin")
    torch_export.save_torch_checkpoint(sd, path)

    _, other_params, other_bs = _tiny_vlp_state(1, task=task)
    new_params, new_bs = torch_init.init_vlp_from_torch(
        jax.device_get(other_params), jax.device_get(other_bs), path)
    _assert_trees_equal(new_params, params, "params")
    _assert_trees_equal(new_bs, batch_stats, "batch_stats")


@pytest.mark.slow
def test_export_cli_from_orbax(tmp_path):
    """End-to-end: orbax run dir -> export_main -> torch.load'able file with
    the pretrain layout, epoch selected by resume-by-scan."""
    from medvill_tpu.cli import export_main

    _, state = _tiny_pretrain_state(0)
    run_dir = os.path.join(tmp_path, "run")
    ckpt_lib.save(run_dir, 0, jax.device_get(state))
    ckpt_lib.save(run_dir, 2, jax.device_get(state))
    out = export_main.main([
        "--checkpoint", run_dir, "--output",
        os.path.join(tmp_path, "exported.bin")])
    sd = torch.load(out, map_location="cpu", weights_only=False)
    assert "enc.encoder.layer.0.attention.output.dense.weight" in sd
    w = sd["enc.txt_embeddings.word_embeddings.weight"]
    np.testing.assert_array_equal(
        w.numpy(),
        np.asarray(jax.device_get(
            state.params["enc"]["embeddings"]["word_embeddings"]
            ["embedding"]), np.float32))


def test_export_without_batch_stats_raises_clearly():
    """A bare param tree (no TrainState batch_stats) cannot export any
    trunk-bearing layout — the error must say why, not KeyError deep in
    _export_trunk."""
    _, state = _tiny_pretrain_state(0)
    params = jax.device_get(state.params)
    with pytest.raises(ValueError, match="batch_stats"):
        torch_export.export_cxrbert_state_dict(params, {})


def test_detect_kind():
    assert torch_export.detect_kind({"enc": {}, "mlm": {}}) == "pretrain"
    assert torch_export.detect_kind({"enc": {}, "clf": {}}) == "mmbt"
    assert torch_export.detect_kind({"bert": {}, "cls": {}}) == "finetune"
    assert torch_export.detect_kind({"txt_encoder": {}}) == "cnn_bert"
    with pytest.raises(ValueError):
        torch_export.detect_kind({"something": {}})


def test_fused_qkv_export_splits():
    """A fused-QKV tree exports to the torch query/key/value linears that
    checkpoint.fuse_qkv_encoder would re-fuse to the same parameter."""
    rng = np.random.default_rng(0)
    H = 8
    kernel = rng.standard_normal((H, 3 * H)).astype(np.float32)
    bias = rng.standard_normal((3 * H,)).astype(np.float32)
    encoder = {"layer_0": {
        "self": {"qkv": {"kernel": kernel, "bias": bias}},
        "attention_output": {
            "dense": {"kernel": np.eye(H, dtype=np.float32),
                      "bias": np.zeros(H, np.float32)},
            "LayerNorm": {"scale": np.ones(H, np.float32),
                          "bias": np.zeros(H, np.float32)}},
        "intermediate": {"kernel": np.eye(H, dtype=np.float32),
                         "bias": np.zeros(H, np.float32)},
        "output_dense": {"kernel": np.eye(H, dtype=np.float32),
                         "bias": np.zeros(H, np.float32)},
        "output_LayerNorm": {"scale": np.ones(H, np.float32),
                             "bias": np.zeros(H, np.float32)},
    }}
    out = {}
    torch_export._export_encoder(out, "encoder", encoder)
    np.testing.assert_array_equal(
        out["encoder.layer.0.attention.self.query.weight"],
        kernel[:, :H].T)
    np.testing.assert_array_equal(
        out["encoder.layer.0.attention.self.value.bias"], bias[2 * H:])
    refused = ckpt_lib.fuse_qkv_encoder({"layer_0": {"self": {
        m: {"kernel": out[f"encoder.layer.0.attention.self.{m}.weight"].T,
            "bias": out[f"encoder.layer.0.attention.self.{m}.bias"]}
        for m in ("query", "key", "value")}}})
    np.testing.assert_array_equal(
        refused["layer_0"]["self"]["qkv"]["kernel"], kernel)
