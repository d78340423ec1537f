"""End-to-end tiny pretrain step: data pipeline -> model -> optimizer.

Exercises the full slice on synthetic data (SURVEY.md §7 step 2): loss is
finite, decreases over a few steps, metrics have the right shapes, and the
step runs identically under an 8-device data mesh.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.core.mesh import make_mesh, replicate, shard_batch
from medvill_tpu.data.pretrain import (BatchLoader, CXRPretrainDataset,
                                       synthetic_records)
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import init_state, make_eval_step, make_train_step


def tiny_cfg(**kw) -> PretrainConfig:
    return PretrainConfig(
        seq_len=7,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3),
        batch_size=8, lr=1e-3, **kw)


@pytest.fixture(scope="module")
def tiny_batch(request):
    from medvill_tpu.data.tokenization import BertTokenizer, build_vocab
    cfg = tiny_cfg()
    vocab = build_vocab([f"word{i}" for i in range(50)])
    tok = BertTokenizer(vocab)
    recs = synthetic_records(16)
    rng = np.random.default_rng(0)
    loader = CXRPretrainDataset(
        recs, tok, cfg, seed=0,
        image_loader=lambda p: rng.standard_normal(
            (cfg.image.img_size, cfg.image.img_size, 3)).astype(np.float32))
    batches = BatchLoader(loader, cfg.batch_size, shuffle=False)
    return cfg, next(iter(batches)), len(vocab)


def test_dataset_shapes(tiny_batch):
    cfg, batch, _ = tiny_batch
    B = cfg.batch_size
    assert batch["cls_tok"].shape == (B, 1)
    assert batch["input_txt"].shape == (B, cfg.seq_len + 1)
    assert batch["txt_labels"].shape == (B, cfg.total_len)
    assert batch["mask_spec"].shape == (B, 2)
    assert batch["segment"].shape == (B, cfg.seq_len + 1)
    assert batch["image"].shape == (B, 64, 64, 3)
    # at least one MLM target per sample (dataset_origin.py:204-208)
    assert ((batch["txt_labels"] != -100).sum(axis=1) >= 1).all()


def test_train_step_runs_and_learns(tiny_batch):
    cfg, batch, vocab_size = tiny_batch
    # model vocab must cover the data vocab
    cfg = dataclasses.replace(cfg, bert=BertConfig.test_tiny(vocab_size=64))
    assert vocab_size <= cfg.bert.vocab_size
    tx = optim.adamw(cfg.lr)
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    rng = jax.random.PRNGKey(1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert 0 <= float(metrics["mlm_correct"]) <= float(metrics["mlm_total"])
    assert int(state.step) == 5


def test_eval_step(tiny_batch):
    cfg, batch, _ = tiny_batch
    tx = optim.adamw(cfg.lr)
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    eval_step = jax.jit(make_eval_step(model, cfg))
    metrics = eval_step(state, jax.tree_util.tree_map(jnp.asarray, batch))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_under_data_mesh(tiny_batch):
    """Same program over an 8-device mesh: batch sharded, params replicated."""
    cfg, batch, _ = tiny_batch
    mesh = make_mesh((-1,))
    assert mesh.devices.size == 8
    tx = optim.adamw(cfg.lr)
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch)
    step = jax.jit(make_train_step(model, tx, cfg))
    state2, metrics = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # numerically equal to the single-device run (same batch, same rng)
    model_1, state_1 = init_state(cfg, jax.random.PRNGKey(0), tx)
    step_1 = jax.jit(make_train_step(model_1, tx, cfg))
    state_1b, metrics_1 = step_1(
        state_1, jax.tree_util.tree_map(jnp.asarray, batch),
        jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_1["loss"]), rtol=1e-4)


def test_mask_variants_change_logits(tiny_batch):
    """FULL vs S2S vs NONCROSS must produce different MLM logits."""
    from medvill_tpu.core.config import MaskVariant
    cfg, batch, _ = tiny_batch
    tx = optim.adamw(cfg.lr)
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)

    def logits_for(variant):
        b = dict(batch)
        spec = np.array(batch["mask_spec"]).copy()
        spec[:, 0] = int(variant)
        b["mask_spec"] = spec
        mlm, itm = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(b["cls_tok"]), jnp.asarray(b["input_txt"]),
            jnp.asarray(b["mask_spec"]), jnp.asarray(b["segment"]),
            jnp.asarray(b["image"]), jnp.asarray(b["sep_tok"]),
            pixel_indices=jnp.arange(cfg.image.num_image_embeds),
            deterministic=True)
        return np.asarray(mlm)

    full = logits_for(MaskVariant.FULL)
    s2s = logits_for(MaskVariant.S2S)
    noncross = logits_for(MaskVariant.NONCROSS)
    assert not np.allclose(full, s2s)
    assert not np.allclose(full, noncross)
