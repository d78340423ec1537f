"""Tensor-parallel (2-D data x model mesh) pretrain step.

The reference's only parallelism axis is data (SURVEY.md §2.6), which this
package reproduces; TP is a beyond-parity scaling option for larger
derivatives of the architecture.  `core/mesh.py::tp_shard` places the
existing TrainState with Megatron-style column/row shardings over a
``model`` axis — no model-code changes, XLA GSPMD inserts the activation
collectives — so the SAME jitted train step runs data-parallel,
tensor-parallel, or both, and must produce the same loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.core.mesh import (MODEL_AXIS, make_mesh, replicate,
                                   shard_batch, tp_shard, tp_spec)
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


def test_tp_spec_rules():
    spec = tp_spec("['params']['enc']['encoder']['layer_0']['self']"
                   "['query']['kernel']", 2)
    assert tuple(spec) == (None, MODEL_AXIS)
    spec = tp_spec("['params']['enc']['encoder']['layer_0']['self']"
                   "['value']['bias']", 1)
    assert tuple(spec) == (MODEL_AXIS,)
    spec = tp_spec("['params']['enc']['encoder']['layer_0']"
                   "['attention_output']['dense']['kernel']", 2)
    assert tuple(spec) == (MODEL_AXIS, None)
    # row-parallel bias, LayerNorms, embeddings: replicated
    assert tuple(tp_spec("['attention_output']['dense']['bias']", 1)) == ()
    assert tuple(tp_spec("['attention_output']['LayerNorm']['scale']",
                         1)) == ()
    assert tuple(tp_spec("['embeddings']['word_embeddings']['embedding']",
                         2)) == ()
    spec = tp_spec("['layer_1']['intermediate']['kernel']", 2)
    assert tuple(spec) == (None, MODEL_AXIS)
    spec = tp_spec("['layer_1']['output_dense']['kernel']", 2)
    assert tuple(spec) == (MODEL_AXIS, None)
    # adam mu/nu mirror the param paths -> same rule applies
    spec = tp_spec("[0]['mu']['enc']['encoder']['layer_0']['self']"
                   "['key']['kernel']", 2)
    assert tuple(spec) == (None, MODEL_AXIS)


def test_tensor_parallel_matches_data_parallel():
    n = jax.device_count()
    assert n >= 4, "virtual multi-device platform not active"
    B = 8
    cfg = _tiny_cfg(B)
    tx = optim.masked_trainable(
        optim.adamw(cfg.lr),
        lambda p: resnet_lib.cnn_freeze_mask(p, ("enc", "img_encoder")))
    model, state0 = init_state(cfg, jax.random.PRNGKey(0), tx)
    batch = _batch(B, cfg)
    step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)

    # data-parallel reference: 1-D mesh, params replicated
    dp_mesh = make_mesh((n,))
    dp_state = replicate(dp_mesh, state0)
    dp_new, dp_metrics = jax.jit(step)(dp_state, shard_batch(dp_mesh, batch),
                                       key)
    dp_loss = float(dp_metrics["loss"])

    # 2-D data x model mesh: batch over `data`, params/optimizer TP-sharded
    mesh = make_mesh((n // 2, 2), ("data", MODEL_AXIS))
    tp_state = tp_shard(mesh, state0)
    q = tp_state.params["enc"]["encoder"]["layer_0"]["self"]["query"][
        "kernel"]
    assert not q.sharding.is_fully_replicated, "TP placement was a no-op"
    ffn = tp_state.params["enc"]["encoder"]["layer_0"]["intermediate"][
        "kernel"]
    assert not ffn.sharding.is_fully_replicated
    tp_new, tp_metrics = jax.jit(step)(tp_state, shard_batch(mesh, batch),
                                       key)
    tp_loss = float(tp_metrics["loss"])

    assert np.isfinite(tp_loss)
    # same math, different reduction order across shards
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=2e-5, atol=2e-5)
    # updated params stay sharded and numerically match the DP run
    q_new = tp_new.params["enc"]["encoder"]["layer_0"]["self"]["query"][
        "kernel"]
    assert not q_new.sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(q_new),
        np.asarray(dp_new.params["enc"]["encoder"]["layer_0"]["self"][
            "query"]["kernel"]), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_finetune_step():
    """The name-keyed TP rules generalize to the VLP finetune tree (same
    BertLayer module names under a different root)."""
    import jax.numpy as jnp

    from medvill_tpu.core.config import FinetuneConfig
    from medvill_tpu.train import finetune as ft
    from medvill_tpu.train.pretrain import TrainState

    n = jax.device_count()
    assert n >= 4
    B = 8
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        len_vis_input=4, max_len_b=10, max_seq_length=24, max_pred=3,
        img_size=64, batch_size=B, label_smoothing=0.1)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 64, 64, 3)),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    tx = ft.make_finetune_tx(cfg)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    mesh = make_mesh((n // 2, 2), ("data", MODEL_AXIS))
    tp_state = tp_shard(mesh, state)
    # at least one encoder kernel must actually be sharded
    enc = tp_state.params
    while "encoder" not in enc:
        enc = enc[next(iter(enc))]
    q = enc["encoder"]["layer_0"]["self"]["query"]["kernel"]
    assert not q.sharding.is_fully_replicated

    rng = np.random.default_rng(1)
    vis2 = cfg.len_vis_input + 2
    batch = dict(
        image=rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        input_ids=rng.integers(0, 64, (B, L)).astype(np.int32),
        segment_ids=np.concatenate(
            [np.full((B, vis2), 4, np.int32),
             np.full((B, L - vis2), 5, np.int32)], 1),
        mask_spec=np.stack([np.full(B, 1, np.int32),
                            np.full(B, L, np.int32)], -1),
        masked_pos=rng.integers(vis2, L, (B, cfg.max_pred)).astype(np.int32),
        masked_ids=rng.integers(1, 64, (B, cfg.max_pred)).astype(np.int32),
        masked_weights=np.ones((B, cfg.max_pred), np.float32),
    )
    step = jax.jit(ft.make_train_step(model, tx, cfg, t_total=100))
    _, aux = step(tp_state, shard_batch(mesh, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))


def test_tensor_parallel_decode_matches_replicated():
    """KV-cached greedy decode with TP-sharded weights (model-parallel
    serving) must emit the same tokens as the replicated run."""
    import jax.numpy as jnp

    from medvill_tpu.core.config import FinetuneConfig
    from medvill_tpu.models.decoder import DecodeSettings, greedy_decode
    from medvill_tpu.train import finetune as ft

    n = jax.device_count()
    assert n >= 4
    B = 8
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        len_vis_input=4, max_len_b=10, max_seq_length=24, max_pred=3,
        img_size=64, batch_size=B)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 64, 64, 3)),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    settings = DecodeSettings(max_txt_length=4, mask_word_id=4, eos_id=-1)
    image = np.random.default_rng(3).standard_normal(
        (B, 64, 64, 3)).astype(np.float32)
    run = jax.jit(lambda v, im: greedy_decode(model, v, im, settings, 2, 3))

    dp_mesh = make_mesh((n,))
    ref_ids, _, _ = run(replicate(dp_mesh, variables),
                        shard_batch(dp_mesh, image))

    mesh = make_mesh((n // 2, 2), ("data", MODEL_AXIS))
    tp_vars = tp_shard(mesh, variables)
    tp_ids, _, _ = run(tp_vars, shard_batch(mesh, image))
    np.testing.assert_array_equal(np.asarray(tp_ids), np.asarray(ref_ids))


def test_sharded_attention_wrapper_matches_unwrapped():
    """set_attention_mesh routes the kernel through shard_map (GSPMD cannot
    partition the Mosaic custom call).  With dropout off, the wrapped path
    must match the unwrapped one exactly — on the 1-D data mesh and on the
    2-D (data, model) mesh with TP-sharded params."""
    import dataclasses

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
    step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)

    dp_mesh = make_mesh((n,))
    set_attention_mesh(None)
    _, m_ref = jax.jit(step)(replicate(dp_mesh, state0),
                             shard_batch(dp_mesh, batch), key)
    loss_ref = float(m_ref["loss"])

    set_attention_mesh(dp_mesh)
    _, m_dp = jax.jit(step)(replicate(dp_mesh, state0),
                            shard_batch(dp_mesh, batch), key)
    np.testing.assert_allclose(float(m_dp["loss"]), loss_ref,
                               rtol=1e-5, atol=1e-6)

    tp_mesh = make_mesh((n // 2, 2), ("data", MODEL_AXIS))
    set_attention_mesh(tp_mesh)
    _, m_tp = jax.jit(step)(tp_shard(tp_mesh, state0),
                            shard_batch(tp_mesh, batch), key)
    np.testing.assert_allclose(float(m_tp["loss"]), loss_ref,
                               rtol=1e-5, atol=1e-6)


def test_cli_mesh_and_place_modes():
    from medvill_tpu.core.mesh import cli_mesh_and_place

    n = jax.device_count()
    mesh, place = cli_mesh_and_place((-1,), 1)
    assert tuple(mesh.axis_names) == ("data",)
    x = place({"self": {"query": {"kernel": np.zeros((4, 4), np.float32)}}})
    assert x["self"]["query"]["kernel"].sharding.is_fully_replicated

    mesh, place = cli_mesh_and_place((-1,), 2)
    assert tuple(mesh.axis_names) == ("data", MODEL_AXIS)
    assert dict(mesh.shape) == {"data": n // 2, MODEL_AXIS: 2}
    x = place({"self": {"query": {"kernel": np.zeros((4, 4), np.float32)}}})
    assert not x["self"]["query"]["kernel"].sharding.is_fully_replicated


def test_tp_shard_skips_indivisible_dims():
    n = jax.device_count()
    mesh = make_mesh((n // 2, 2), ("data", MODEL_AXIS))
    # heads=2 is divisible by model=2, but a 3-wide leaf on the sharded dim
    # must silently replicate instead of failing at lowering
    tree = {"self": {"query": {"kernel": np.zeros((4, 3), np.float32)}}}
    out = tp_shard(mesh, tree)
    assert out["self"]["query"]["kernel"].sharding.is_fully_replicated


def test_cli_mesh_rejects_head_splitting_tp():
    """--model_parallel must divide num_attention_heads: hidden-dim
    divisibility alone (768 % 8 == 0) would otherwise shard QKV kernels
    into fractional-head chunks while the attention shard_map path silently
    declines (12 % 8 != 0), leaving redundant all-gathered attention."""
    import pytest

    from medvill_tpu.core.mesh import cli_mesh_and_place

    with pytest.raises(ValueError, match="num_attention_heads"):
        cli_mesh_and_place((-1,), model_parallel=8, num_heads=12)
    # valid degree passes
    mesh, place = cli_mesh_and_place((-1,), model_parallel=2, num_heads=12)
    assert mesh.shape["model"] == 2
