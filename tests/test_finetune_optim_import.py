"""BertAdamFineTune decay-to-init + HF->joint-encoder weight import."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medvill_tpu.core import checkpoint as C
from medvill_tpu.core.config import BertConfig, ImageEncoderConfig
from medvill_tpu.train import optim


def test_decay_to_init_pulls_toward_init():
    init = {"w": jnp.asarray(np.full((3,), 5.0, np.float32))}
    params = {"w": jnp.asarray(np.full((3,), 1.0, np.float32))}
    tx = optim.decay_to_init(0.1, init)
    updates = {"w": jnp.zeros((3,))}
    out, _ = tx.update(updates, tx.init(params), params)
    # update += wd * (p - p_init) = 0.1 * (1 - 5) = -0.4; applied as
    # p -= lr * update elsewhere, i.e. pushes p UP toward init
    np.testing.assert_allclose(np.asarray(out["w"]), -0.4, rtol=1e-6)


def test_bert_adam_finetune_converges_to_init_without_grads():
    init = {"w": jnp.asarray(np.full((2,), 3.0, np.float32))}
    params = {"w": jnp.asarray(np.zeros((2,), np.float32))}
    tx = optim.bert_adam_finetune(0.5, init, weight_decay=0.5,
                                  max_grad_norm=-1)
    state = tx.init(params)
    import optax

    for _ in range(200):
        g = {"w": jnp.zeros((2,))}
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    # with zero grads and decay-to-init, params drift toward init (3.0)
    assert abs(float(params["w"][0]) - 3.0) < 0.5


def test_load_hf_bert_into_joint():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig as HFConfig, BertModel as HFBert

    from medvill_tpu.models.cxrbert import CXRBERT

    hf = HFBert(HFConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=16, type_vocab_size=2))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = BertConfig.test_tiny(vocab_size=64)
    model = CXRBERT(cfg, ImageEncoderConfig(img_size=64, num_image_embeds=3))
    B, T = 2, 8
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.full((B, 1), 2, jnp.int32), jnp.zeros((B, T), jnp.int32),
        jnp.zeros((B, 2), jnp.int32), jnp.ones((B, T), jnp.int32),
        jnp.zeros((B, 64, 64, 3)), jnp.full((B, 1), 3, jnp.int32),
        pixel_indices=jnp.arange(3), deterministic=True)
    params = variables["params"]
    new = C.load_hf_bert_into_joint(params, sd, num_layers=2)

    # embeddings copied (position table resized 16 -> 512)
    np.testing.assert_array_equal(
        np.asarray(new["enc"]["embeddings"]["word_embeddings"]["embedding"]),
        sd["embeddings.word_embeddings.weight"])
    pos = np.asarray(
        new["enc"]["embeddings"]["position_embeddings"]["embedding"])
    assert pos.shape[0] == 512
    np.testing.assert_array_equal(
        pos[:16], sd["embeddings.position_embeddings.weight"])
    # encoder layer 0 query copied (transposed)
    np.testing.assert_array_equal(
        np.asarray(new["enc"]["encoder"]["layer_0"]["self"]["query"]
                   ["kernel"]),
        sd["encoder.layer.0.attention.self.query.weight"].T)
    # image projection untouched (random init preserved)
    np.testing.assert_array_equal(
        np.asarray(new["enc"]["img_projection"]["kernel"]),
        np.asarray(params["enc"]["img_projection"]["kernel"]))
    # model still runs with the grafted params
    out_mlm, out_itm = model.apply(
        {"params": new, "batch_stats": variables.get("batch_stats", {})},
        jnp.full((B, 1), 2, jnp.int32), jnp.zeros((B, T), jnp.int32),
        jnp.zeros((B, 2), jnp.int32), jnp.ones((B, T), jnp.int32),
        jnp.zeros((B, 64, 64, 3)), jnp.full((B, 1), 3, jnp.int32),
        pixel_indices=jnp.arange(3), deterministic=True)
    assert np.isfinite(np.asarray(out_mlm, np.float32)).all()
