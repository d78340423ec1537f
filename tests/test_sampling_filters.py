"""Sampling-control filters (beyond parity): temperature / top-k / top-p
logits filtering for the multinomial decode mode.  The reference's sampler
is plain softmax multinomial (model.py:1209-1215); these knobs default to
the identity and are validated here against hand-computed filters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.models.decoder import filter_sample_logits


def test_defaults_are_identity():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((3, 17)),
                         jnp.float32)
    out = filter_sample_logits(logits)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))


def test_temperature_scales_logits():
    logits = jnp.asarray([[2.0, -4.0, 0.5]])
    out = filter_sample_logits(logits, temperature=0.5)
    np.testing.assert_allclose(np.asarray(out), [[4.0, -8.0, 1.0]],
                               rtol=1e-6)


def test_temperature_must_be_positive():
    with pytest.raises(ValueError):
        filter_sample_logits(jnp.zeros((1, 4)), temperature=0.0)


def test_top_k_keeps_k_highest():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(filter_sample_logits(logits, top_k=2))
    # 5.0 and 4.0 survive; the rest are -inf
    assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 4])
    assert np.all(np.isneginf(out[0, [0, 2, 3]]))
    np.testing.assert_allclose(out[0, [1, 4]], [5.0, 4.0])


def test_top_k_geq_vocab_is_identity():
    logits = jnp.asarray([[1.0, 5.0, 3.0]])
    out = np.asarray(filter_sample_logits(logits, top_k=3))
    np.testing.assert_allclose(out, np.asarray(logits))


def test_top_p_keeps_smallest_prefix_reaching_mass():
    # softmax of [~log 0.5, ~log 0.3, ~log 0.2] mass: 0.5, 0.3, 0.2
    probs = np.asarray([0.5, 0.3, 0.2])
    logits = jnp.asarray(np.log(probs))[None, :]
    # p=0.6: first token's mass-before (0) < 0.6, second's (0.5) < 0.6,
    # third's (0.8) >= 0.6 -> keep exactly two
    out = np.asarray(filter_sample_logits(logits, top_p=0.6))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert np.isneginf(out[0, 2])
    # p small enough keeps only the argmax — never zero tokens
    out1 = np.asarray(filter_sample_logits(logits, top_p=1e-6))
    assert np.isfinite(out1[0, 0])
    assert np.all(np.isneginf(out1[0, 1:]))


def test_top_p_row_independent():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    out = np.asarray(filter_sample_logits(logits, top_p=0.8))
    # each row keeps its own prefix; every row keeps >= 1 and the kept set
    # is exactly the minimal descending-prob prefix reaching 0.8
    p = np.exp(np.asarray(logits, np.float64))
    p /= p.sum(-1, keepdims=True)
    for r in range(4):
        order = np.argsort(-p[r])
        cum = np.cumsum(p[r][order])
        n_keep = int(np.searchsorted(cum, 0.8) + 1)
        kept = np.isfinite(out[r])
        assert kept.sum() == n_keep
        assert kept[order[:n_keep]].all()


def test_categorical_never_draws_filtered():
    logits = jnp.asarray([[0.0, 10.0, 0.1, 9.9]])
    filtered = filter_sample_logits(logits, top_k=2)
    draws = jax.random.categorical(
        jax.random.PRNGKey(0), jnp.broadcast_to(filtered, (512, 4)), axis=-1)
    assert set(np.asarray(draws).tolist()) <= {1, 3}


def test_filters_compose_temperature_then_topk():
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    out = np.asarray(filter_sample_logits(logits, temperature=2.0, top_k=1))
    np.testing.assert_allclose(out[0, 0], 1.0)
    assert np.all(np.isneginf(out[0, 1:]))


def test_filter_rejects_out_of_range():
    z = jnp.zeros((1, 4))
    with pytest.raises(ValueError):
        filter_sample_logits(z, top_k=-1)
    with pytest.raises(ValueError):
        filter_sample_logits(z, top_p=0.0)
    with pytest.raises(ValueError):
        filter_sample_logits(z, top_p=-0.5)
    with pytest.raises(ValueError):
        filter_sample_logits(z, top_p=1.5)


def test_sampling_kwargs_helper_validation():
    """The shared CLI helper (decode_main + serve_main) validates at
    startup: bad ranges, knobs without --do_sample, sampling with beam."""
    import argparse

    from medvill_tpu.cli import sampling_kwargs

    def ns(**kw):
        d = dict(do_sample=False, temperature=1.0, top_k=0, top_p=1.0)
        d.update(kw)
        return argparse.Namespace(**d)

    assert sampling_kwargs(ns(), 1)["sample_mode"] == "greedy"
    got = sampling_kwargs(ns(do_sample=True, temperature=0.7, top_k=40,
                             top_p=0.9), 1)
    assert got == dict(sample_mode="sample", temperature=0.7, top_k=40,
                       top_p=0.9)
    with pytest.raises(ValueError):  # sampling is a greedy-loop mode
        sampling_kwargs(ns(do_sample=True), 4)
    with pytest.raises(ValueError):  # knobs require --do_sample
        sampling_kwargs(ns(temperature=0.5), 1)
    with pytest.raises(ValueError):  # knobs require --do_sample (top_p)
        sampling_kwargs(ns(top_p=0.5), 1)
    with pytest.raises(ValueError):  # temperature 0 is invalid, not 'off'
        sampling_kwargs(ns(do_sample=True, temperature=0.0), 1)
    with pytest.raises(ValueError):  # negative top_k is invalid, not inert
        sampling_kwargs(ns(do_sample=True, top_k=-5), 1)
    with pytest.raises(ValueError):  # top_p 0 is invalid, not 'argmax'
        sampling_kwargs(ns(do_sample=True, top_p=0.0), 1)
