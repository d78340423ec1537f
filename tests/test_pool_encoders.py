"""Pool-config image encoders (num_image_embeds 1-9) vs torch adaptive
pooling (reference: mmbt/models/image.py:16-56, models/image.py:71-93)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from medvill_tpu.models.resnet import (POOL_SHAPES, adaptive_pool,
                                       half_pooled_fibers, pooled_fibers)


@pytest.mark.parametrize("mode", ["avg", "max"])
@pytest.mark.parametrize("n", sorted(POOL_SHAPES))
def test_adaptive_pool_matches_torch(n, mode):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, 7, 7, 16)).astype(np.float32)  # 224-px map
    out_hw = POOL_SHAPES[n]
    pool = (torch.nn.AdaptiveAvgPool2d(out_hw) if mode == "avg"
            else torch.nn.AdaptiveMaxPool2d(out_hw))
    want = pool(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(adaptive_pool(jnp.asarray(x), out_hw, mode))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", sorted(POOL_SHAPES))
def test_pooled_fibers_flatten_order(n):
    """torch flattens [B,C,oh,ow] at dim 2 then transposes -> [B,N,C];
    ours reshapes NHWC — orders must agree."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)  # 512-px map
    oh, ow = POOL_SHAPES[n]
    t = torch.nn.AdaptiveAvgPool2d((oh, ow))(
        torch.tensor(x.transpose(0, 3, 1, 2)))
    want = torch.flatten(t, start_dim=2).transpose(1, 2).numpy()
    got = np.asarray(pooled_fibers(jnp.asarray(x), n))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_half_pooled_fibers():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    t = torch.nn.AdaptiveAvgPool2d((8, 8))(
        torch.tensor(x.transpose(0, 3, 1, 2)))
    want = torch.flatten(t, start_dim=2).transpose(1, 2).numpy()
    got = np.asarray(half_pooled_fibers(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pooled_fibers_rejects_undefined_n():
    x = jnp.zeros((1, 7, 7, 4))
    with pytest.raises(ValueError):
        pooled_fibers(x, 10)


@pytest.mark.slow
def test_mmbt_pool_encoder_forward():
    from medvill_tpu.core.config import BertConfig, ImageEncoderConfig
    from medvill_tpu.models.mmbt import MultimodalBertClf

    cfg = BertConfig.test_tiny(vocab_size=64)
    image = ImageEncoderConfig(img_size=64, num_image_embeds=3,
                               encoder="pool", pool_type="avg")
    model = MultimodalBertClf(cfg, image, n_classes=4)
    B, T = 2, 12
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, T), jnp.int32), jnp.full((B,), T, jnp.int32),
        jnp.ones((B, T), jnp.int32), jnp.zeros((B, 64, 64, 3)), 2, 3)
    out = model.apply(variables, jnp.zeros((B, T), jnp.int32),
                      jnp.full((B,), T, jnp.int32),
                      jnp.ones((B, T), jnp.int32),
                      jnp.zeros((B, 64, 64, 3)), 2, 3)
    assert out.shape == (B, 4)
    assert np.isfinite(np.asarray(out)).all()
