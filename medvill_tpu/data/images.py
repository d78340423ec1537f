"""Host-side image decode + preprocessing.

Replaces the PIL/torchvision transform stack (reference: data/helper.py:9-27;
sc/data_loader.py:322-326,421-428).  Decode stays on host (PIL); resize and
normalization are plain NumPy emitting NHWC float32 — the device-side fused
preprocess (bf16 cast + normalize inside the first conv's producer) is XLA's
job once the batch lands on TPU.

ImageNet/ChexNet stats: mean (0.485, 0.456, 0.406), std (0.229, 0.224, 0.225).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float32 in [0,1] -> ImageNet-normalized."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def to_float(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def load_image(path: str, size: int, channels: int = 3,
               grayscale_to_rgb: bool = False,
               do_resize: bool = True,
               keep_uint8: bool = True) -> np.ndarray:
    """Decode -> (optional grayscale->3ch) -> resize.

    Returns [size, size, 3] uint8 NHWC by default — the raw-pixel wire
    format: 4x less host->device traffic than normalized f32, with the
    exact to_float + ImageNet normalize running on device instead
    (``models/resnet.py::device_normalize``; bit-identical formula).  Pass
    ``keep_uint8=False`` for the host-normalized f32 array (torch reference
    semantics on the dataloader host; NCHW there, NHWC here — the
    TPU-native layout).
    """
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    img = Image.open(path)
    if grayscale_to_rgb:
        img = img.convert("L").convert("RGB")
    else:
        img = img.convert("RGB")
    if do_resize:
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img)
    if keep_uint8:
        return arr
    return normalize(to_float(arr))


def synthetic_image(rng: np.random.Generator, size: int,
                    channels: int = 3) -> np.ndarray:
    """Random normalized image for tests/benchmarks."""
    return rng.standard_normal((size, size, channels)).astype(np.float32)


def as_wire_image(img: np.ndarray) -> np.ndarray:
    """Coerce a loader output to the device wire format: uint8 passes
    through raw (device-normalized later), anything else becomes float32
    (assumed already normalized, e.g. custom/test loaders)."""
    img = np.asarray(img)
    return img if img.dtype == np.uint8 else img.astype(np.float32)
