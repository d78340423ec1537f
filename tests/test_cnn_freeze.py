"""The reference's unconditional whole-trunk CNN freeze.

Every CNN image-encoder model sets ``requires_grad=False`` on ALL trunk
params at construction time: the apparent unfreeze of
``children()[5:]`` is a no-op because ImageEncoder_cnn's only child is one
nn.Sequential (reference: models/cxrbert_origin.py:65-70,
models/image.py:46-52, sc/pytorch_pretrained_bert/model.py:910-924).  Here
the train step stop-grads the trunk leaves (so XLA DCEs the entire conv
backward) and the optimizer masks their updates (so weight decay cannot
move them).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig, \
    PretrainConfig
from medvill_tpu.models import resnet as resnet_lib
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import init_state, make_train_step


def tiny_cfg(**kw):
    return PretrainConfig(
        batch_size=2, seq_len=15,
        bert=BertConfig(vocab_size=64, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        use_flash_attention=False, mlm_loss_chunk=8, **kw)


def make_batch(cfg, rng):
    B, L_txt = cfg.batch_size, cfg.seq_len + 1
    return dict(
        cls_tok=np.full((B, 1), 3, np.int32),
        input_txt=rng.integers(0, 64, (B, L_txt)).astype(np.int32),
        txt_labels=np.where(rng.random((B, cfg.total_len)) < 0.3,
                            rng.integers(0, 64, (B, cfg.total_len)),
                            -100).astype(np.int32),
        mask_spec=np.stack([np.full(B, 2, np.int32),
                            np.full(B, L_txt, np.int32)], -1),
        segment=np.ones((B, L_txt), np.int32),
        image=rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        is_aligned=np.array([0, 1], np.int32),
        sep_tok=np.full((B, 1), 4, np.int32),
    )


def test_frozen_trunk_params_unchanged_and_bert_moves():
    cfg = tiny_cfg()
    tx = optim.adamw(1e-3, weight_decay=0.01)
    tx = optim.masked_trainable(
        tx, lambda p: resnet_lib.cnn_freeze_mask(
            p, ("enc", "img_encoder")))
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_batch(cfg, np.random.default_rng(0)))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    trunk0 = state.params["enc"]["img_encoder"]
    trunk1 = new_state.params["enc"]["img_encoder"]
    # frozen: the ENTIRE trunk is identical (weight decay masked too)
    for b, a in zip(jax.tree_util.tree_leaves(trunk0),
                    jax.tree_util.tree_leaves(trunk1)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # ...but the transformer moved
    q0 = state.params["enc"]["encoder"]["layer_0"]["self"]["query"]["kernel"]
    q1 = new_state.params["enc"]["encoder"]["layer_0"]["self"]["query"][
        "kernel"]
    assert float(jnp.abs(q0 - q1).max()) > 0


def test_frozen_bn_running_stats_still_update():
    """torch BN in train mode updates running stats regardless of
    requires_grad — the frozen prefix's batch_stats must keep moving."""
    cfg = tiny_cfg()
    tx = optim.adamw(1e-3)
    tx = optim.masked_trainable(
        tx, lambda p: resnet_lib.cnn_freeze_mask(
            p, ("enc", "img_encoder")))
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_batch(cfg, np.random.default_rng(1)))
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    bn1_before = state.batch_stats["enc"]["img_encoder"]["bn1"]["mean"]
    bn1_after = new_state.batch_stats["enc"]["img_encoder"]["bn1"]["mean"]
    assert float(jnp.abs(bn1_before - bn1_after).max()) > 0


def test_stop_gradient_prunes_frozen_backward():
    """The stop-grad makes all trunk grads literal zeros (XLA can then
    DCE the producing ops — the whole conv backward disappears)."""
    cfg = tiny_cfg()
    model, state = init_state(cfg, jax.random.PRNGKey(0),
                              optim.adamw(1e-3))
    from medvill_tpu.train.pretrain import pretrain_loss_and_metrics

    def loss_fn(params):
        params = optim.stop_frozen(
            params, resnet_lib.cnn_freeze_mask(
                params, ("enc", "img_encoder")))
        loss, _ = pretrain_loss_and_metrics(
            model, params, state.batch_stats,
            jax.tree_util.tree_map(
                jnp.asarray, make_batch(cfg, np.random.default_rng(2))),
            jax.random.PRNGKey(0), None, cfg, train=True)
        return loss

    grads = jax.grad(loss_fn)(state.params)
    g_trunk = jax.tree_util.tree_leaves(grads["enc"]["img_encoder"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in g_trunk)
    # the joint-embedding image projection (outside the trunk) still trains
    g_proj = jax.tree_util.tree_leaves(grads["enc"]["img_projection"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_proj)


def test_vit_encoder_not_frozen():
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                      encoder="ViT", patch_size=32))
    model, state = init_state(cfg, jax.random.PRNGKey(0), optim.adamw(1e-3))
    with pytest.raises(ValueError):
        resnet_lib.cnn_freeze_mask(
            state.params, ("enc", "img_encoder", "layer1_0"))
    # ViT path: make_train_step must not try to freeze
    tx = optim.adamw(1e-3)
    step = jax.jit(make_train_step(model, tx, cfg))
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_batch(cfg, np.random.default_rng(3)))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
