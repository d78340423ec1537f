"""Gathered MLM loss == chunked full-position MLM loss (same CE-with-ignore
semantics as torch CrossEntropyLoss(ignore_index=-100), reference:
models/train_origin.py:62,108-126)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig, \
    PretrainConfig
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import (_chunked_mlm_loss,
                                        _gathered_mlm_loss, init_state)


def setup(bound):
    cfg = PretrainConfig(
        batch_size=3, seq_len=15,
        bert=BertConfig(vocab_size=64, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4),
        use_flash_attention=False, mlm_loss_chunk=8, mlm_gather_bound=bound)
    model, state = init_state(cfg, jax.random.PRNGKey(0),
                              optim.adamw(1e-3))
    return cfg, model, state


def random_case(T=16, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(
        rng.standard_normal((3, T, 32)).astype(np.float32))
    labels = np.where(rng.random((3, T)) < density,
                      rng.integers(0, 64, (3, T)), -100).astype(np.int32)
    return hidden, jnp.asarray(labels)


def test_gathered_matches_chunked():
    cfg, model, state = setup(bound=8)
    hidden, labels = random_case(density=0.3, seed=1)
    l1, c1, n1 = _chunked_mlm_loss(model, state.params, hidden, labels,
                                   chunk=8)
    l2, c2, n2 = _gathered_mlm_loss(model, state.params, hidden, labels,
                                    bound=8)
    assert int(n1) == int(n2)
    assert int(c1) == int(c2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_gathered_matches_chunked_dense_labels_at_exact_bound():
    cfg, model, state = setup(bound=16)
    hidden, labels = random_case(density=1.0, seed=2)  # every position
    l1, c1, n1 = _chunked_mlm_loss(model, state.params, hidden, labels,
                                   chunk=8)
    l2, c2, n2 = _gathered_mlm_loss(model, state.params, hidden, labels,
                                    bound=16)
    assert int(n1) == int(n2) == 48
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_no_labels_is_zero_loss():
    cfg, model, state = setup(bound=8)
    hidden, _ = random_case(seed=3)
    labels = jnp.full((3, 16), -100, jnp.int32)
    l2, c2, n2 = _gathered_mlm_loss(model, state.params, hidden, labels,
                                    bound=8)
    assert int(n2) == 0 and int(c2) == 0
    assert float(l2) == 0.0


def test_train_step_uses_gathered_and_matches_chunked_step():
    """End-to-end: one train step with gather_bound vs the chunked path
    produces the same loss and the same parameter update."""
    from medvill_tpu.train.pretrain import make_train_step

    def run(bound):
        cfg, model, state = setup(bound)
        tx = optim.adamw(1e-3)
        _, state = init_state(cfg, jax.random.PRNGKey(0), tx)
        rng = np.random.default_rng(5)
        B, L_txt = 3, cfg.seq_len + 1
        batch = jax.tree_util.tree_map(jnp.asarray, dict(
            cls_tok=np.full((B, 1), 3, np.int32),
            input_txt=rng.integers(0, 64, (B, L_txt)).astype(np.int32),
            txt_labels=np.where(rng.random((B, cfg.total_len)) < 0.3,
                                rng.integers(0, 64, (B, cfg.total_len)),
                                -100).astype(np.int32),
            mask_spec=np.stack([np.full(B, 2, np.int32),
                                np.full(B, L_txt, np.int32)], -1),
            segment=np.ones((B, L_txt), np.int32),
            image=rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
            is_aligned=np.array([0, 1, 1], np.int32),
            sep_tok=np.full((B, 1), 4, np.int32),
        ))
        step = jax.jit(make_train_step(model, tx, cfg))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        return new_state, metrics

    s_g, m_g = run(bound=8)
    s_c, m_c = run(bound=0)  # falls back to chunked
    np.testing.assert_allclose(float(m_g["loss"]), float(m_c["loss"]),
                               rtol=2e-5)
    assert int(m_g["mlm_total"]) == int(m_c["mlm_total"])
    q_g = s_g.params["enc"]["encoder"]["layer_0"]["self"]["query"]["kernel"]
    q_c = s_c.params["enc"]["encoder"]["layer_0"]["self"]["query"]["kernel"]
    np.testing.assert_allclose(np.asarray(q_g), np.asarray(q_c),
                               rtol=1e-4, atol=1e-6)
