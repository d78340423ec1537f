"""BertAdam semantics vs a literal NumPy transcription of the reference
optimizer (sc/pytorch_pretrained_bert/optimization.py:58-182)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.train import optim


def torch_style_bert_adam_step(p, g, m, v, lr, step, t_total, warmup,
                               b1=0.9, b2=0.999, eps=1e-6, wd=0.01,
                               max_grad_norm=1.0):
    """Single-tensor update, transcribed from optimization.py:141-170."""
    norm = np.sqrt((g ** 2).sum())
    if max_grad_norm > 0 and norm > max_grad_norm:
        g = g * (max_grad_norm / (norm + 1e-6))
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    update = m / (np.sqrt(v) + eps)
    if wd > 0:
        update = update + wd * p
    x = step / t_total
    sched = x / warmup if x < warmup else max((x - 1) / (warmup - 1), 0)
    lr_t = lr * sched
    return p - lr_t * update, m, v


def test_bert_adam_matches_reference_transcription():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) * 3
             for _ in range(4)]
    lr, t_total, warmup = 1e-2, 100, 0.1

    tx = optim.bert_adam(lr, warmup=warmup, t_total=t_total,
                         weight_decay=0.01)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    p_np, m_np, v_np = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    for i, g in enumerate(grads):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        p_np, m_np, v_np = torch_style_bert_adam_step(
            p_np, g, m_np, v_np, lr, i, t_total, warmup)
        np.testing.assert_allclose(np.asarray(params["w"]), p_np, rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {i}")


def test_per_tensor_clip():
    tx = optim.clip_per_tensor_norm(1.0)
    g = {"a": jnp.full((4,), 10.0), "b": jnp.full((4,), 0.1)}
    out, _ = tx.update(g, tx.init(g))
    # 'a' norm 20 -> scaled to ~1; 'b' norm 0.2 -> untouched
    assert np.isclose(np.linalg.norm(np.asarray(out["a"])), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["b"]), np.asarray(g["b"]))


def test_warmup_linear_shape():
    w = optim.warmup_linear(jnp.asarray([0.0, 0.05, 0.1, 0.55, 1.0]), 0.1)
    np.testing.assert_allclose(np.asarray(w), [0.0, 0.5, 1.0, 0.5, 0.0],
                               atol=1e-6)


def test_no_decay_mask():
    params = {
        "encoder": {"layer_0": {"self": {"query": {"kernel": 1, "bias": 1}},
                    "output_LayerNorm": {"scale": 1, "bias": 1}}}}
    mask = optim.no_decay_mask(params)
    assert mask["encoder"]["layer_0"]["self"]["query"]["kernel"] is True
    assert mask["encoder"]["layer_0"]["self"]["query"]["bias"] is False
    assert mask["encoder"]["layer_0"]["output_LayerNorm"]["scale"] is False


def test_noam_schedule():
    fn = optim.noam_schedule(512, 4000)
    v1 = float(fn(jnp.asarray(1)))
    v4000 = float(fn(jnp.asarray(4000)))
    v8000 = float(fn(jnp.asarray(8000)))
    assert v1 < v4000 and v8000 < v4000
