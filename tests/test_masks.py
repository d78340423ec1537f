"""Golden tests for the 5 mask variants: the spec-based device builder must
bit-match a literal NumPy transcription of the reference algorithm
(data/dataset_origin.py:140-177 and sc/data_loader.py:395-412)."""
import numpy as np
import pytest

from medvill_tpu.core.config import MaskVariant
from medvill_tpu.data import masks as M


GEOM = M.MaskGeometry(num_image_embeds=4, seq_len=7)


def torch_style_reference(variant, txt_len, geom):
    """Second, independent transcription of dataset_origin.py:140-177 using
    explicit loops (the oracle for reference_dense_mask too)."""
    L, I2 = geom.total_len, geom.img_block
    m = np.zeros((L, L), dtype=np.int64)
    attn_1d = [1] * I2 + [1] * txt_len + [0] * (L - I2 - txt_len)
    v = MaskVariant(int(variant))
    if v in (MaskVariant.FULL, MaskVariant.ATTN1D):
        for r in range(L):
            m[r] = attn_1d
        return m
    if v in (MaskVariant.S2S, MaskVariant.BAR):
        for r in range(L):
            for c in range(I2):
                m[r, c] = 1
        for r in range(I2, L):
            for c in range(I2, r + 1):
                m[r, c] = 1
        if v == MaskVariant.BAR:
            for r in range(I2):
                m[r, :] = 1
        return m
    if v == MaskVariant.NONCROSS:
        m[:I2, :I2] = 1
        m[I2:, I2:] = 1
        return m
    raise ValueError(v)


@pytest.mark.parametrize("variant", list(MaskVariant))
@pytest.mark.parametrize("txt_len", [1, 3, 8])  # 8 == seq_len+1 (full text)
def test_reference_dense_mask_matches_loops(variant, txt_len):
    got = M.reference_dense_mask(variant, txt_len, GEOM)
    want = torch_style_reference(variant, txt_len, GEOM)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("variant", list(MaskVariant))
def test_device_builder_matches_reference(variant):
    import jax.numpy as jnp

    txt_lens = [1, 2, 5, 8]
    spec = jnp.array([[int(variant), t] for t in txt_lens], dtype=jnp.int32)
    dense = np.asarray(M.dense_mask_from_spec(spec, GEOM))
    for i, t in enumerate(txt_lens):
        want = M.reference_dense_mask(variant, t, GEOM)
        np.testing.assert_array_equal(dense[i], want,
                                      err_msg=f"variant={variant} txt_len={t}")


def test_bias_values():
    import jax.numpy as jnp

    spec = jnp.array([[int(MaskVariant.S2S), 3]], dtype=jnp.int32)
    bias = np.asarray(M.bias_from_spec(spec, GEOM))
    assert bias.shape == (1, 1, GEOM.total_len, GEOM.total_len)
    dense = M.reference_dense_mask(MaskVariant.S2S, 3, GEOM)
    np.testing.assert_allclose(bias[0, 0], (1 - dense) * -10000.0)


def seq2seq_torch_style(mode, n_tokens, vis_input, max_len):
    """Loop transcription of sc/data_loader.py:395-412."""
    m = np.zeros((max_len, max_len), dtype=np.int64)
    vis = vis_input + 2
    if mode == "bi":
        row = [1] * n_tokens + [0] * (max_len - n_tokens)
        for r in range(max_len):
            m[r] = row
        return m
    m[:, :vis] = 1
    for r in range(vis, n_tokens):
        for c in range(vis, r + 1):
            m[r, c] = 1
    if mode == "bar":
        m[:vis, :] = 1
    return m


@pytest.mark.parametrize("mode", ["bi", "s2s", "bar"])
@pytest.mark.parametrize("n_extra", [0, 2, 5])
def test_seq2seq_masks(mode, n_extra):
    vis_input, max_len = 4, 20
    n_tokens = vis_input + 3 + n_extra  # CLS + img + SEP + txt + SEP
    got = M.seq2seq_dense_mask(mode, n_tokens, vis_input, max_len)
    want = seq2seq_torch_style(mode, n_tokens, vis_input, max_len)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["bi", "s2s", "bar"])
def test_seq2seq_device_builder(mode):
    import jax.numpy as jnp

    vis_input, max_len = 4, 20
    vid = M.SEQ2SEQ_VARIANT_IDS[mode]
    n_tokens = [vis_input + 3, vis_input + 3 + 4]
    dense = np.asarray(M.seq2seq_spec_dense(
        jnp.array([vid] * len(n_tokens), jnp.int32),
        jnp.array(n_tokens, jnp.int32), vis_input, max_len))
    for i, n in enumerate(n_tokens):
        want = M.seq2seq_dense_mask(mode, n, vis_input, max_len)
        np.testing.assert_array_equal(dense[i], want)


def test_decoder_mask():
    m = M.decoder_dense_mask(max_a_len=4, max_len_in_batch=12)
    vis = 6
    assert (m[:, :vis] == 1).all()
    for r in range(vis, 12):
        for c in range(vis, 12):
            assert m[r, c] == (1 if c <= r else 0)


def test_noncross_extra_text_cls_geometry():
    g = M.MaskGeometry(num_image_embeds=4, seq_len=7, extra_text_cls=True)
    assert g.total_len == GEOM.total_len + 1
    m = M.reference_dense_mask(MaskVariant.NONCROSS, 3, g)
    I2 = g.img_block
    assert (m[:I2, :I2] == 1).all() and (m[I2:, I2:] == 1).all()
    assert (m[:I2, I2:] == 0).all() and (m[I2:, :I2] == 0).all()
