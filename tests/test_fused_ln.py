"""Fused dropout+residual+LayerNorm Pallas kernel (ops/fused_ln.py) vs
the XLA composition it replaces.  Runs in interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.ops.fused_ln import TILE_R, fused_dropout_add_ln

EPS = 1e-12


def _ref(x, res, gamma, beta, eps=EPS):
    """The XLA chain at rate=0: f32 stats, like nn.LayerNorm."""
    s = x.astype(jnp.float32) + res.astype(jnp.float32)
    mean = s.mean(-1, keepdims=True)
    var = ((s - mean) ** 2).mean(-1, keepdims=True)
    y = (s - mean) * jax.lax.rsqrt(var + eps)
    return y * gamma + beta


def _inputs(r=70, h=256, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((r, h)), dtype)
    res = jnp.asarray(rng.standard_normal((r, h)), dtype)
    gamma = jnp.asarray(rng.standard_normal(h).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(h).astype(np.float32))
    return x, res, gamma, beta


def test_forward_matches_reference_rate0():
    x, res, gamma, beta = _inputs()
    y = fused_dropout_add_ln(x, res, gamma, beta, rate=0.0, eps=EPS,
                             seed=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(
        x, res, gamma, beta)), rtol=2e-5, atol=2e-5)


def test_forward_3d_and_padding():
    # rows not a multiple of TILE_R, and a leading batch dim
    x, res, gamma, beta = _inputs(r=TILE_R + 13, h=128)
    x3 = x.reshape(1, -1, 128)
    res3 = res.reshape(1, -1, 128)
    y = fused_dropout_add_ln(x3, res3, gamma, beta, rate=0.0, eps=EPS,
                             seed=jnp.int32(0))
    assert y.shape == x3.shape
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, 128),
        np.asarray(_ref(x, res, gamma, beta)), rtol=2e-5, atol=2e-5)


def test_grads_match_reference_rate0():
    x, res, gamma, beta = _inputs(r=40, h=128)

    def f_fused(x, res, g, b):
        return (fused_dropout_add_ln(x, res, g, b, rate=0.0, eps=EPS,
                                     seed=jnp.int32(0)) ** 2).sum()

    def f_ref(x, res, g, b):
        return (_ref(x, res, g, b) ** 2).sum()

    got = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, res, gamma, beta)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, res, gamma, beta)
    for g_got, g_want, name in zip(got, want, "x res gamma beta".split()):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dropout_deterministic_and_rate():
    x, res, gamma, beta = _inputs(r=512, h=256)
    kw = dict(rate=0.5, eps=EPS)
    y1 = fused_dropout_add_ln(x, res, gamma, beta, seed=jnp.int32(7), **kw)
    y2 = fused_dropout_add_ln(x, res, gamma, beta, seed=jnp.int32(7), **kw)
    y3 = fused_dropout_add_ln(x, res, gamma, beta, seed=jnp.int32(8), **kw)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.abs(np.asarray(y1) - np.asarray(y3)).max() > 1e-3
    assert np.isfinite(np.asarray(y1)).all()


def test_dropout_keep_fraction():
    # recover the keep mask: with res=0, gamma=1, beta=0 the dropped
    # positions of (x + 0) enter LN as exact zeros of s = x*keep*2; use
    # the pre-LN sum via rate with identity LN stats — simpler: compare
    # against rate=0 run and count changed zero-pattern on the raw sum.
    # Directly: dropped inputs contribute s=res; set res distinct so a
    # drop is detectable.
    r, h = 1024, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((r, h)), jnp.float32)
    res = jnp.zeros((r, h), jnp.float32)
    ones = jnp.ones(h, jnp.float32)
    zer = jnp.zeros(h, jnp.float32)
    # bypass LN's scale-invariance when counting: use the VJP wrt res,
    # which is independent of the keep mask only through LN stats; count
    # via forward instead with gamma=1, beta=0 and eps large so LN is
    # nearly affine: y ~ (s - mean)/sqrt(eps)
    big_eps = 1e6
    y = fused_dropout_add_ln(x, res, ones, zer, rate=0.5, eps=big_eps,
                             seed=jnp.int32(11))
    s_rec = np.asarray(y) * np.sqrt(big_eps)  # ~ s - mean_row(s)
    # dropped entries of s are exactly 0, so they all recover to the SAME
    # per-row value (-mean_row(s)); kept entries are 2*x + that constant,
    # continuous-valued.  The per-row modal value therefore counts the
    # dropped entries exactly.
    dropped = 0
    for row in s_rec:
        _, counts = np.unique(row, return_counts=True)
        dropped += int(counts.max())
    frac = dropped / s_rec.size
    assert 0.45 < frac < 0.55, frac


def test_vjp_consistent_with_fixed_mask():
    """With the seed fixed the function is locally linear in x (away from
    mask boundaries); the VJP must match central finite differences."""
    x, res, gamma, beta = _inputs(r=32, h=128)
    v = jnp.asarray(np.random.default_rng(5).standard_normal(x.shape),
                    jnp.float32)

    def f(x):
        return (fused_dropout_add_ln(x, res, gamma, beta, rate=0.3,
                                     eps=EPS, seed=jnp.int32(2))
                * jnp.cos(jnp.arange(x.shape[-1]))).sum()

    g = jax.grad(f)(x)
    eps_fd = 1e-3
    fd = (f(x + eps_fd * v) - f(x - eps_fd * v)) / (2 * eps_fd)
    got = float(jnp.vdot(g, v))
    # tolerance is set by the f32 CANCELLATION in the central difference,
    # not by VJP quality: |f| ~ 1e2, so ulp(f)/eps_fd ~ 6e-3 absolute —
    # and XLA may fuse f's reduction differently between the grad and
    # eval programs depending on compile-cache state (a 2e-3 tolerance
    # failed order-dependently in a full-suite run at -3.553 vs -3.586).
    # The tight analytic-parity checks live in
    # test_grads_match_reference_rate0.
    assert got == pytest.approx(float(fd), rel=2e-2, abs=2e-2)


def test_bf16_io():
    x, res, gamma, beta = _inputs(r=64, h=256, dtype=jnp.bfloat16)
    y = fused_dropout_add_ln(x, res, gamma, beta, rate=0.0, eps=EPS,
                             seed=jnp.int32(0))
    assert y.dtype == jnp.bfloat16
    want = _ref(x, res, gamma, beta)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_bert_encoder_fused_flag_tree_and_forward():
    """BertConfig.fused_ln swaps the (dropout, LN) pair for the fused
    module WITHOUT changing the parameter tree, and the deterministic
    forward matches the unfused stack."""
    import dataclasses

    from medvill_tpu.core.config import BertConfig
    from medvill_tpu.models.bert import BertEncoder

    base = dataclasses.replace(
        BertConfig.test_tiny(vocab_size=32), compute_dtype="float32")
    fused_cfg = dataclasses.replace(base, fused_ln=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, base.hidden_size)), jnp.float32)

    enc_a = BertEncoder(base)
    enc_b = BertEncoder(fused_cfg)
    va = enc_a.init({"params": jax.random.PRNGKey(0)}, x, None,
                    deterministic=True)
    vb = enc_b.init({"params": jax.random.PRNGKey(0)}, x, None,
                    deterministic=True)
    paths_a = set(tuple(str(k) for k in p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(va)[0])
    paths_b = set(tuple(str(k) for k in p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(vb)[0])
    assert paths_a == paths_b
    ya, _ = enc_a.apply(va, x, None, deterministic=True)
    # identical init rng + identical tree -> same params; run the fused
    # program on them
    yb, _ = enc_b.apply(va, x, None, deterministic=True)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=2e-5, atol=2e-5)
    # train mode (dropout active) stays finite and differs from eval
    yt, _ = enc_b.apply(va, x, None, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(yt)).all()
    assert not np.allclose(np.asarray(yt), np.asarray(yb))
