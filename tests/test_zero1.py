"""ZeRO-1 optimizer-state sharding (core/mesh.py::zero1_shard).

Beyond parity — the reference's only strategy is replicated-optimizer DDP
(SURVEY.md §2.6).  zero1_shard places Adam's mu/nu moments sharded over the
``data`` axis (each chip stores 1/N of the optimizer state; XLA GSPMD
computes moment updates on the local shard and all-gathers the parameter
delta — ZeRO-1's collective schedule, arXiv:1910.02054).  The SAME jitted
train step must produce the same loss and the same updated parameters as
the fully replicated placement, and the moments must stay sharded across
steps so the memory saving survives the donated-state update loop.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, cli_mesh_and_place,
                                   make_mesh, replicate, shard_batch,
                                   tp_shard, zero1_shard)
from medvill_tpu.models import resnet as resnet_lib
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import init_state, make_train_step

pytestmark = pytest.mark.slow


def _tiny_cfg(n_batch):
    return PretrainConfig(
        batch_size=n_batch, seq_len=7,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3),
        lr=1e-3)


def _batch(B, cfg, seed=0):
    rng = np.random.default_rng(seed)
    L_txt = cfg.seq_len + 1
    return dict(
        cls_tok=np.full((B, 1), 2, np.int32),
        input_txt=rng.integers(0, 64, (B, L_txt)).astype(np.int32),
        txt_labels=np.where(rng.random((B, cfg.total_len)) < 0.15,
                            rng.integers(0, 64, (B, cfg.total_len)),
                            -100).astype(np.int32),
        mask_spec=np.stack([np.full(B, 2, np.int32),
                            np.full(B, L_txt, np.int32)], -1),
        segment=np.ones((B, L_txt), np.int32),
        image=rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        is_aligned=rng.integers(0, 2, (B,)).astype(np.int32),
        sep_tok=np.full((B, 1), 3, np.int32),
    )


def _mu_leaf(state):
    """A representative moment leaf: layer_0 query kernel's mu."""
    leaves = [(jax.tree_util.keystr(p), x) for p, x in
              jax.tree_util.tree_leaves_with_path(state.opt_state)]
    for s, x in leaves:
        if "mu" in s and "layer_0" in s and "query" in s and \
                s.endswith("kernel']"):
            return s, x
    raise AssertionError("mu leaf not found")


def _data_sharded(x):
    spec = getattr(x.sharding, "spec", None)
    return spec is not None and DATA_AXIS in tuple(spec)


def test_zero1_moments_sharded_and_step_matches_replicated():
    n = jax.device_count()
    assert n >= 4, "virtual multi-device platform not active"
    B = 8
    cfg = _tiny_cfg(B)
    tx = optim.masked_trainable(
        optim.adamw(cfg.lr),
        lambda p: resnet_lib.cnn_freeze_mask(p, ("enc", "img_encoder")))
    model, state0 = init_state(cfg, jax.random.PRNGKey(0), tx)
    batch = _batch(B, cfg)
    step = jax.jit(make_train_step(model, tx, cfg))
    key = jax.random.PRNGKey(1)
    mesh = make_mesh((n,))

    ref_state = replicate(mesh, state0)
    ref_state, ref_m = step(ref_state, shard_batch(mesh, batch), key)
    ref_state, ref_m2 = step(ref_state, shard_batch(mesh, batch),
                             jax.random.PRNGKey(2))

    z_state = zero1_shard(mesh, state0)
    s, mu0 = _mu_leaf(z_state)
    assert _data_sharded(mu0), (s, mu0.sharding)
    # per-device shard is 1/n of the moment
    shard_elems = mu0.addressable_shards[0].data.size
    assert shard_elems * n == mu0.size
    # params stay replicated under plain ZeRO-1
    q = z_state.params["enc"]["encoder"]["layer_0"]["self"]["query"]["kernel"]
    assert tuple(q.sharding.spec) == ()

    z_state, z_m = step(z_state, shard_batch(mesh, batch), key)
    np.testing.assert_allclose(float(z_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-6, atol=1e-6)
    # moments remain sharded after the jitted update (elementwise moment
    # math propagates the input sharding), so the memory saving holds
    # across the training loop
    _, mu1 = _mu_leaf(z_state)
    assert _data_sharded(mu1), mu1.sharding
    z_state, z_m2 = step(z_state, shard_batch(mesh, batch),
                         jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(z_m2["loss"]), float(ref_m2["loss"]),
                               rtol=1e-6, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        z_state.params, ref_state.params)


def test_zero1_composes_with_tensor_parallel():
    """On a 2-D (data, model) mesh zero1_shard keeps tp_spec placements for
    params and adds data-axis sharding to the moments on a tp-free dim —
    same loss as the pure-TP and replicated placements (dropout off so all
    layouts agree exactly; see test_tensor_parallel.py)."""
    from medvill_tpu.ops.flash_attention import set_attention_mesh

    n = jax.device_count()
    assert n >= 4
    B = 8
    cfg = _tiny_cfg(B)
    cfg = dataclasses.replace(cfg, bert=dataclasses.replace(
        cfg.bert, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
    tx = optim.adamw(cfg.lr)
    model, state0 = init_state(cfg, jax.random.PRNGKey(0), tx)
    batch = _batch(B, cfg)
    step = jax.jit(make_train_step(model, tx, cfg))
    key = jax.random.PRNGKey(1)

    dp_mesh = make_mesh((n,))
    ref_state, ref_m = step(replicate(dp_mesh, state0),
                            shard_batch(dp_mesh, batch), key)

    tp_mesh = make_mesh((n // 2, 2), ("data", MODEL_AXIS))
    set_attention_mesh(tp_mesh)
    z_state = zero1_shard(tp_mesh, state0)
    # param keeps the Megatron column sharding
    q = z_state.params["enc"]["encoder"]["layer_0"]["self"]["query"]["kernel"]
    assert MODEL_AXIS in tuple(q.sharding.spec)
    # the matching moment leaf carries BOTH axes: tp column + zero1 data
    _, mu0 = _mu_leaf(z_state)
    assert MODEL_AXIS in tuple(mu0.sharding.spec)
    assert DATA_AXIS in tuple(mu0.sharding.spec)
    z_state, z_m = step(z_state, shard_batch(tp_mesh, batch), key)
    np.testing.assert_allclose(float(z_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5, atol=1e-6)
    # cross-layout collective order shifts bf16-compute params by
    # ~5e-5 abs (measured) against lr=1e-3-scale Adam updates; relative
    # tolerance is meaningless on near-zero params
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4),
        z_state.params, ref_state.params)


def test_zero1_skips_undividable_dims():
    """Leaves with no data-divisible free dim stay on the base placement
    (e.g. a [2, 3] moment on an 8-device axis)."""
    n = jax.device_count()
    assert n >= 4
    mesh = make_mesh((n,))

    class FakeAdam:
        pass

    tree = {"mu": {"odd": np.zeros((2, 3), np.float32),
                   "even": np.zeros((n * 2, 3), np.float32)},
            "count": np.zeros((), np.int32)}
    placed = zero1_shard(mesh, tree)
    assert tuple(placed["mu"]["odd"].sharding.spec) == ()
    assert DATA_AXIS in tuple(placed["mu"]["even"].sharding.spec)
    assert tuple(placed["count"].sharding.spec) == ()


def test_cli_mesh_and_place_zero1_mode():
    n = jax.device_count()
    assert n >= 4
    B = 8
    cfg = _tiny_cfg(B)
    tx = optim.adamw(cfg.lr)
    _, state0 = init_state(cfg, jax.random.PRNGKey(0), tx)
    mesh, place = cli_mesh_and_place((-1,), zero1=True)
    placed = place(state0)
    _, mu0 = _mu_leaf(placed)
    assert _data_sharded(mu0)
    # and with TP: both axes on the mesh, moments data-sharded
    mesh2, place2 = cli_mesh_and_place((-1,), model_parallel=2, zero1=True)
    assert mesh2.shape[MODEL_AXIS] == 2
    placed2 = place2(state0)
    _, mu2 = _mu_leaf(placed2)
    assert _data_sharded(mu2)
