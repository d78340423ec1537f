"""Encoder remat (same numerics, checkpointed backward) + async save."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core import checkpoint as C
from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import init_state, make_train_step


def tiny_cfg(remat: bool) -> PretrainConfig:
    return PretrainConfig(
        seq_len=7,
        bert=dataclasses.replace(BertConfig.test_tiny(vocab_size=64),
                                 remat=remat),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3),
        batch_size=4, lr=1e-3)


def make_batch(cfg):
    rng = np.random.default_rng(0)
    B, L_txt = cfg.batch_size, cfg.seq_len + 1
    return dict(
        cls_tok=jnp.asarray(np.full((B, 1), 2, np.int32)),
        input_txt=jnp.asarray(rng.integers(0, 64, (B, L_txt)).astype(
            np.int32)),
        txt_labels=jnp.asarray(np.where(
            rng.random((B, cfg.total_len)) < 0.15,
            rng.integers(0, 64, (B, cfg.total_len)), -100).astype(np.int32)),
        mask_spec=jnp.asarray(np.stack(
            [np.full(B, 2, np.int32), np.full(B, L_txt, np.int32)], -1)),
        segment=jnp.asarray(np.ones((B, L_txt), np.int32)),
        image=jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(
            np.float32)),
        is_aligned=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.int32)),
        sep_tok=jnp.asarray(np.full((B, 1), 3, np.int32)))


def test_remat_same_loss_trajectory():
    losses = {}
    for remat in (False, True):
        cfg = tiny_cfg(remat)
        tx = optim.adamw(cfg.lr)
        model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
        step = jax.jit(make_train_step(model, tx, cfg))
        batch = make_batch(cfg)
        ls = []
        for _ in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(1))
            ls.append(float(m["loss"]))
        losses[remat] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_async_save_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(4.0)}}
    C.save(str(tmp_path), 0, state, async_save=True)
    # second save waits for the first; then a final sync save flushes
    C.save(str(tmp_path), 1, state, async_save=True)
    C.save(str(tmp_path), 2, state)
    for e in (0, 1, 2):
        restored = C.restore(str(tmp_path), e, state)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.arange(4.0))
