"""uint8 image wire format: loaders ship raw pixels (4x less host->device
traffic), the model normalizes on device (models/resnet.py::
device_normalize) with the exact host formula — proven equal here."""
import io

import jax
import jax.numpy as jnp
import numpy as np

from medvill_tpu.data import images as image_lib
from medvill_tpu.models.resnet import ResNet50Trunk, device_normalize


def test_device_normalize_matches_host():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    host = np.stack([image_lib.normalize(image_lib.to_float(r))
                     for r in raw])
    dev = np.asarray(device_normalize(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)
    # float inputs pass through untouched
    f = host.astype(np.float32)
    np.testing.assert_array_equal(np.asarray(device_normalize(
        jnp.asarray(f))), f)


def test_trunk_forward_equal_for_both_wire_formats():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    host = np.stack([image_lib.normalize(image_lib.to_float(r))
                     for r in raw])
    trunk = ResNet50Trunk(stage_sizes=(1, 1, 1, 1), width=8)
    variables = trunk.init(jax.random.PRNGKey(0), jnp.asarray(host))
    out_f32 = np.asarray(trunk.apply(variables, jnp.asarray(host)),
                         np.float32)
    out_u8 = np.asarray(trunk.apply(variables, jnp.asarray(raw)),
                        np.float32)
    # bf16 trunk compute: the two paths may round differently only at the
    # f32->bf16 input cast; outputs must agree to bf16 precision
    np.testing.assert_allclose(out_u8, out_f32, rtol=2e-2, atol=2e-2)


def test_vit_patch_embedding_accepts_uint8():
    from medvill_tpu.models.joint import ImagePatchEmbedding

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    host = np.stack([image_lib.normalize(image_lib.to_float(r))
                     for r in raw])
    emb = ImagePatchEmbedding(image_size=16, patch_size=8, dim=8)
    variables = emb.init(jax.random.PRNGKey(0), jnp.asarray(host))
    out_f32 = np.asarray(emb.apply(variables, jnp.asarray(host)))
    out_u8 = np.asarray(emb.apply(variables, jnp.asarray(raw)))
    np.testing.assert_allclose(out_u8, out_f32, rtol=1e-4, atol=1e-5)


def test_load_image_wire_formats(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    p = str(tmp_path / "x.png")
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), np.uint8),
                    "RGB").save(p)
    raw = image_lib.load_image(p, 16)
    assert raw.dtype == np.uint8 and raw.shape == (16, 16, 3)
    norm = image_lib.load_image(p, 16, keep_uint8=False)
    assert norm.dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(device_normalize(jnp.asarray(raw[None])))[0], norm,
        rtol=1e-6, atol=1e-6)
    # as_wire_image: uint8 passes, floats coerce to f32
    assert image_lib.as_wire_image(raw).dtype == np.uint8
    assert image_lib.as_wire_image(norm.astype(np.float64)).dtype \
        == np.float32
