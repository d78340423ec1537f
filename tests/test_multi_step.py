"""make_multi_train_step: k micro-steps per jit dispatch.

The scanned multi-step must be bit-equivalent (up to f32 reduction noise)
to k sequential single-step dispatches — same params trajectory, same
metrics per micro-step — both in the stacked-batch form (real training)
and the reuse-batch form (synthetic benches).  The reference has no
equivalent; each loss.backward() is its own launch
(models/train_origin.py:96-107).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import (init_state, make_multi_train_step,
                                        make_train_step)


def tiny_cfg(**kw) -> PretrainConfig:
    return PretrainConfig(
        seq_len=7,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        batch_size=4, lr=1e-3, use_flash_attention=False,
        mlm_loss_chunk=8, **kw)


def make_batch(cfg, rng, B):
    L_txt = cfg.seq_len + 1
    return dict(
        cls_tok=np.full((B, 1), 3, np.int32),
        input_txt=rng.integers(0, 64, (B, L_txt)).astype(np.int32),
        txt_labels=np.where(rng.random((B, cfg.total_len)) < 0.3,
                            rng.integers(0, 64, (B, cfg.total_len)),
                            -100).astype(np.int32),
        mask_spec=np.stack([np.full(B, 2, np.int32),
                            np.full(B, L_txt, np.int32)], -1),
        segment=np.ones((B, L_txt), np.int32),
        image=rng.standard_normal(
            (B, cfg.image.img_size, cfg.image.img_size, 3)
        ).astype(np.float32),
        is_aligned=rng.integers(0, 2, (B,)).astype(np.int32),
        sep_tok=np.full((B, 1), 4, np.int32),
    )


def tree_allclose(a, b, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol,
                                   rtol=1e-5)


def test_stacked_multi_step_matches_sequential():
    cfg = tiny_cfg()
    k, B = 3, cfg.batch_size
    tx = optim.adamw(cfg.lr)
    model, state0 = init_state(cfg, jax.random.PRNGKey(0), tx)
    rng = np.random.default_rng(0)
    micro = [make_batch(cfg, rng, B) for _ in range(k)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *micro)
    key = jax.random.PRNGKey(7)

    step = jax.jit(make_train_step(model, tx, cfg))
    seq_state = state0
    seq_metrics = []
    for b in micro:
        seq_state, m = step(seq_state, jax.tree_util.tree_map(jnp.asarray, b),
                            key)
        seq_metrics.append(m)

    multi = jax.jit(make_multi_train_step(model, tx, cfg, k))
    multi_state, metrics = multi(state0, stacked, key)

    assert int(multi_state.step) == k
    tree_allclose(seq_state.params, multi_state.params)
    # metrics stack along the micro-step axis
    assert metrics["loss"].shape == (k,)
    for i, m in enumerate(seq_metrics):
        np.testing.assert_allclose(float(metrics["loss"][i]),
                                   float(m["loss"]), atol=1e-5, rtol=1e-5)


def test_reuse_batch_multi_step_matches_sequential():
    cfg = tiny_cfg()
    k, B = 3, cfg.batch_size
    tx = optim.adamw(cfg.lr)
    model, state0 = init_state(cfg, jax.random.PRNGKey(1), tx)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_batch(cfg, np.random.default_rng(1), B))
    key = jax.random.PRNGKey(9)

    step = jax.jit(make_train_step(model, tx, cfg))
    seq_state = state0
    for _ in range(k):
        seq_state, _ = step(seq_state, batch, key)

    multi = jax.jit(make_multi_train_step(model, tx, cfg, k,
                                          reuse_batch=True))
    multi_state, metrics = multi(state0, batch, key)
    assert metrics["loss"].shape == (k,)
    tree_allclose(seq_state.params, multi_state.params)


def test_multi_step_composes_with_grad_accum():
    """optax.MultiSteps state advances inside the scan: k=4 micro-steps with
    accum-every-2 must equal 2 full optimizer steps."""
    cfg = tiny_cfg()
    k, B = 4, cfg.batch_size
    tx = optim.accumulate(optim.adamw(cfg.lr), 2)
    model, state0 = init_state(cfg, jax.random.PRNGKey(2), tx)
    rng = np.random.default_rng(2)
    micro = [make_batch(cfg, rng, B) for _ in range(k)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *micro)
    key = jax.random.PRNGKey(11)

    step = jax.jit(make_train_step(model, tx, cfg))
    seq_state = state0
    for b in micro:
        seq_state, _ = step(seq_state, jax.tree_util.tree_map(jnp.asarray, b),
                            key)

    multi = jax.jit(make_multi_train_step(model, tx, cfg, k))
    multi_state, _ = multi(state0, stacked, key)
    tree_allclose(seq_state.params, multi_state.params)
    # params actually moved (two applies happened)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state0.params, multi_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_threaded_batch_loader_preserves_order():
    """BatchLoader(workers=N): ThreadPoolExecutor.map preserves result
    order, so on a deterministic dataset the batches are identical to
    sequential fetching (stochastic datasets interleave RNG like the
    reference's DataLoader workers)."""
    from medvill_tpu.data.pretrain import BatchLoader

    class FakeDS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.int32)}

    seq = list(BatchLoader(FakeDS(), 4, shuffle=True, seed=7))
    par = list(BatchLoader(FakeDS(), 4, shuffle=True, seed=7, workers=4))
    assert len(seq) == len(par) == 4
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["x"], b["x"])
