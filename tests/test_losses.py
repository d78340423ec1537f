"""Loss semantics vs torch reference (numerical parity at small sizes)."""
import numpy as np
import pytest

import jax.numpy as jnp

from medvill_tpu.train import losses as L


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_ce_ignore_index_matches_manual():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 7)).astype(np.float32)
    labels = np.array([[1, -100, 3, -100, 0], [-100, 2, -100, -100, 6]])
    loss, n = L.cross_entropy_ignore_index(jnp.asarray(logits),
                                           jnp.asarray(labels))
    # manual: mean NLL over the 5 valid positions
    p = softmax_np(logits)
    vals = []
    for b in range(2):
        for t in range(5):
            if labels[b, t] != -100:
                vals.append(-np.log(p[b, t, labels[b, t]]))
    assert float(n) == 5
    assert float(loss) == pytest.approx(np.mean(vals), rel=1e-5)


def test_ce_all_ignored_returns_zero():
    logits = jnp.zeros((1, 3, 4))
    labels = jnp.full((1, 3), -100)
    loss, n = L.cross_entropy_ignore_index(logits, labels)
    assert float(loss) == 0.0 and float(n) == 0


def test_label_smoothing_matches_torch_formula():
    """KL(true_dist || logp) with confidence 1-eps, low eps/(V-2), ignore
    column zeroed, rows with ignored target zeroed
    (reference: sc/pytorch_pretrained_bert/loss.py:12-48)."""
    rng = np.random.default_rng(1)
    V, eps = 6, 0.1
    logits = rng.standard_normal((2, 3, V)).astype(np.float32)
    labels = np.array([[1, 0, 2], [3, 5, 0]])  # 0 = ignore_index
    out = np.asarray(L.label_smoothing_loss(jnp.asarray(logits),
                                            jnp.asarray(labels), eps, V))
    logp = np.log(softmax_np(logits))
    for b in range(2):
        for t in range(3):
            tgt = labels[b, t]
            if tgt == 0:
                assert out[b, t] == pytest.approx(0.0, abs=1e-6)
                continue
            td = np.full(V, eps / (V - 2))
            td[tgt] = 1 - eps
            td[0] = 0.0
            want = np.sum(td * (np.log(td + 1e-20) - logp[b, t]))
            assert out[b, t] == pytest.approx(want, rel=1e-4)


def test_drop_worst():
    """(reference: model.py:1003-1010): keep smallest (1-ratio)*B summed
    losses, normalize by kept weights."""
    loss = jnp.array([[1.0, 1.0], [10.0, 10.0], [2.0, 0.0], [3.0, 1.0]])
    weights = jnp.array([[1.0, 1.0], [1.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    out = float(L.drop_worst_normalize(loss, weights, drop_worst_ratio=0.25))
    # per-ex sums: [2, 20, 2, 4]; keep 3 smallest: 2, 2, 4
    # kept weights: ex0=2, ex2=1, ex3=2 -> denom=5 (+1e-5)
    assert out == pytest.approx((2 + 2 + 4) / (5 + 1e-5), rel=1e-5)


def test_bce_matches_manual():
    logits = jnp.array([[0.5, -1.0]])
    targets = jnp.array([[1.0, 0.0]])
    out = float(L.bce_with_logits(logits, targets))
    import math
    want = np.mean([math.log(1 + math.exp(-0.5)),
                    math.log(1 + math.exp(-1.0))])
    assert out == pytest.approx(want, rel=1e-6)


def test_weighted_bce_pos_weight():
    logits = jnp.array([[0.0]])
    targets = jnp.array([[1.0]])
    pw = jnp.array([3.0])
    out = float(L.weighted_bce_with_logits(logits, targets, pw))
    import math
    assert out == pytest.approx(3.0 * math.log(2.0), rel=1e-6)
