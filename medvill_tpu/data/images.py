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
               do_resize: bool = True) -> np.ndarray:
    """Decode -> (optional grayscale->3ch) -> resize -> [0,1] -> normalize.

    Returns [size, size, 3] float32 NHWC (torch reference uses NCHW; our
    models take NHWC, the TPU-native layout).
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
    arr = to_float(np.asarray(img))
    return normalize(arr)


def synthetic_image(rng: np.random.Generator, size: int,
                    channels: int = 3) -> np.ndarray:
    """Random normalized image for tests/benchmarks."""
    return rng.standard_normal((size, size, channels)).astype(np.float32)
