"""Pallas flash kernel vs XLA reference attention: equal logits under every
mask variant (SURVEY.md §7 step 3: "verify bitwise-equal logits vs naive
path under all 5 variants").  Runs in interpreter mode on CPU."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core.config import MaskVariant
from medvill_tpu.data.masks import (MaskGeometry, SEQ2SEQ_VARIANT_IDS,
                                    bias_from_spec, seq2seq_spec_dense)
from medvill_tpu.ops.attention import mha_reference
from medvill_tpu.ops.flash_attention import (FAMILY_PRETRAIN, FAMILY_SEQ2SEQ,
                                             flash_mha)

GEOM = MaskGeometry(num_image_embeds=4, seq_len=7)
B, H, D = 2, 2, 8
L = GEOM.total_len


def make_qkv(seed=0):
    rng = np.random.default_rng(seed)
    shape = (B, L, H, D)
    return tuple(jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                 for _ in range(3))


@pytest.mark.parametrize("variant", list(MaskVariant))
def test_matches_reference_pretrain(variant):
    q, k, v = make_qkv()
    txt_lens = [3, 8]
    spec = jnp.asarray(np.array([[int(variant), t] for t in txt_lens],
                                np.int32))
    bias = bias_from_spec(spec, GEOM)
    want = mha_reference(q, k, v, bias)
    got = flash_mha(q, k, v, spec, img_block=GEOM.img_block, l_real=L,
                    family=FAMILY_PRETRAIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["bi", "s2s", "bar"])
def test_matches_reference_seq2seq(mode):
    q, k, v = make_qkv(1)
    vis_input = 4
    n_tokens = [vis_input + 3, vis_input + 6]
    vid = SEQ2SEQ_VARIANT_IDS[mode]
    spec = jnp.asarray(np.array([[vid, n] for n in n_tokens], np.int32))
    dense = seq2seq_spec_dense(spec[:, 0], spec[:, 1], vis_input, L)
    bias = ((1.0 - dense.astype(jnp.float32)) * -10000.0)[:, None]
    want = mha_reference(q, k, v, bias)
    got = flash_mha(q, k, v, spec, img_block=vis_input + 2, l_real=L,
                    family=FAMILY_SEQ2SEQ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    q, k, v = make_qkv(2)
    spec = jnp.asarray(np.array([[int(MaskVariant.BAR), 5]] * B, np.int32))
    bias = bias_from_spec(spec, GEOM)

    def loss_ref(q, k, v):
        return (mha_reference(q, k, v, bias) ** 2).sum()

    def loss_flash(q, k, v):
        return (flash_mha(q, k, v, spec, img_block=GEOM.img_block, l_real=L,
                          family=FAMILY_PRETRAIN) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_large_padded_shape_shrinks_heads_and_matches():
    """The MMBT classification layout (256 img embeds -> seq 514, padded
    beyond the flagship [448, 512]) must shrink heads-per-block below the
    16M scoped-VMEM limit (24.73M OOM observed at full width on v5e) while
    the flagship shape keeps all 12 heads, and the shrunk grid must still
    match the XLA reference numerically."""
    from medvill_tpu.ops.flash_attention import _heads_per_block

    assert _heads_per_block(12, 64, lq=448, lk=512) == 12
    hpb = _heads_per_block(12, 64, lq=528, lk=640)
    assert hpb < 12 and 12 % hpb == 0

    L2, H2, D2 = 514, 12, 64
    geom = MaskGeometry(num_image_embeds=256, seq_len=L2 - 256 - 3)
    rng = np.random.default_rng(7)
    q2, k2, v2 = (jnp.asarray(
        rng.standard_normal((1, L2, H2, D2)).astype(np.float32))
        for _ in range(3))
    spec = jnp.asarray(np.array([[int(MaskVariant.FULL), 200]], np.int32))
    bias = bias_from_spec(spec, geom)
    want = mha_reference(q2, k2, v2, bias)
    got = flash_mha(q2, k2, v2, spec, img_block=geom.img_block, l_real=L2,
                    family=FAMILY_PRETRAIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dropout_statistics():
    """With dropout active the kernel output stays finite and differs from
    the deterministic one; expectation stays close."""
    q, k, v = make_qkv(3)
    spec = jnp.asarray(np.array([[int(MaskVariant.FULL), 8]] * B, np.int32))
    det = flash_mha(q, k, v, spec, img_block=GEOM.img_block, l_real=L)
    drop = flash_mha(q, k, v, spec, img_block=GEOM.img_block, l_real=L,
                     dropout_rate=0.3, deterministic=False,
                     dropout_rng=jax.random.PRNGKey(0))
    d = np.asarray(drop)
    assert np.isfinite(d).all()
    assert not np.allclose(d, np.asarray(det))
