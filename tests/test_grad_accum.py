"""Gradient accumulation semantics (reference: main_origin.py:141-142,
sc/finetune.py:461-470): accum=k over k micro-batches of size B must match
accum=1 over one batch of size k*B, and params must not move between
optimizer-step boundaries."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medvill_tpu.train import optim


def _data(n=16, d=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    w_true = rng.standard_normal((d,)).astype(np.float32)
    y = x @ w_true + 0.1 * rng.standard_normal(n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _loss(w, x, y):
    return jnp.mean((x @ w - y) ** 2)


def _run(tx, x, y, micro_batches, steps_per_update):
    w = jnp.zeros(x.shape[1])
    state = tx.init(w)
    for xb, yb in micro_batches:
        g = jax.grad(_loss)(w, xb, yb)
        upd, state = tx.update(g, state, w)
        w = optax.apply_updates(w, upd)
    return w


@pytest.mark.parametrize("make_tx", [
    lambda: optim.adamw(1e-2),
    lambda: optax.chain(optim.clip_per_tensor_norm(1.0),
                        optim.scale_by_adam_no_bias_correction(),
                        optax.scale(-1e-2)),
])
def test_accum4_matches_batch4x(make_tx):
    x, y = _data(16)
    # two optimizer steps' worth of data: 2 * (4 micro of 4) = 2 * batch-16
    micro = [(x[i * 4:(i + 1) * 4], y[i * 4:(i + 1) * 4]) for i in range(4)]
    w_accum = _run(optim.accumulate(make_tx(), 4), x, y, micro * 2, 4)
    w_full = _run(make_tx(), x, y, [(x, y), (x, y)], 1)
    np.testing.assert_allclose(np.asarray(w_accum), np.asarray(w_full),
                               rtol=1e-5, atol=1e-6)


def test_no_update_between_boundaries():
    x, y = _data(8)
    tx = optim.accumulate(optim.adamw(1e-2), 4)
    w = jnp.zeros(x.shape[1])
    state = tx.init(w)
    for i in range(3):  # first 3 micro-steps of a 4-window: no movement
        g = jax.grad(_loss)(w, x, y)
        upd, state = tx.update(g, state, w)
        w2 = optax.apply_updates(w, upd)
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))
        w = w2
    g = jax.grad(_loss)(w, x, y)
    upd, state = tx.update(g, state, w)
    w2 = optax.apply_updates(w, upd)
    assert not np.allclose(np.asarray(w), np.asarray(w2))


def test_accumulate_identity_when_1():
    tx = optim.adamw(1e-2)
    assert optim.accumulate(tx, 1) is tx
