"""ResNet-50 visual trunk in Flax (torchvision-v1.5-compatible).

The reference uses torchvision's pretrained ResNet-50 minus the last two
children (avgpool + fc), producing ``B x 2048 x M x M`` fiber maps
(reference: models/image.py:46-58).  This is the same topology: bottleneck
blocks with the stride on the 3x3 conv (torchvision v1.5), BatchNorm with
running stats, so ImageNet weights port 1:1 via
`medvill_tpu.core.checkpoint.import_torchvision_resnet50`.

TPU notes: NHWC layout (XLA-native on TPU), convs in bf16 with fp32 batch-norm
statistics.  The freeze policy (whole trunk frozen — the reference's
children()[5:] unfreeze is a no-op; models/cxrbert_origin.py:65-70,
models/image.py:46-52) is applied by the optimizer via `trainable_mask`,
not by the module.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class StemConv(nn.Module):
    """7x7/stride-2 stem conv with an exact space-to-depth realization.

    Owns the same param tree as ``nn.Conv(name="conv1")`` — ``kernel`` of
    shape [7, 7, C, F] — so torchvision weight import is unchanged.  On even
    inputs the conv is computed as a 4x4/stride-1 conv over the 2x2
    space-to-depth packing: identical math (the 7x7 kernel zero-padded to
    8x8 and regrouped), but the MXU sees 4*C=12 input channels instead of 3
    and half the spatial extent — the [512,512,3] layout is the worst case
    for the 8x128 vector tiles.  (The standard MLPerf ResNet trick.)
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    use_s2d: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, C, self.features), jnp.float32)
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        B, H, W_, _ = x.shape
        if not self.use_s2d or H % 2 or W_ % 2:
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        Hp, Wp = H + 6, W_ + 6  # even (same (3,3) padding as the 7x7 conv)
        xs = xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, Hp // 2, Wp // 2, 4 * C)
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        ws = wp.reshape(4, 2, 4, 2, C, self.features)
        ws = ws.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * C, self.features)
        return jax.lax.conv_general_dilated(
            xs, ws, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    features: int  # bottleneck width; out channels = 4*features
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # compute/emit in bf16 (f32 BN outputs double the ResNet's HBM
        # traffic — measured 183 ms/step of conv-fusion time at batch 36);
        # scale/bias/running stats stay f32 via param_dtype
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        # torchvision v1.5: stride lives on the 3x3 conv
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual.astype(y.dtype))


def device_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Dtype-driven image normalization: the host ships raw uint8 pixels
    (4x less host->device traffic and no per-pixel host float math vs the
    normalized-f32 wire format; reference torchvision normalizes on the
    dataloader host, data/helper.py:9-27), and the exact same transform —
    to_float + ImageNet normalize (data/images.py:21-28) — runs here in f32,
    where XLA fuses it into the stem conv's producer.  Float inputs pass
    through untouched, so both wire formats stay supported."""
    if x.dtype != jnp.uint8:
        return x
    from medvill_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    x = x.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN.reshape(1, 1, 1, 3)) / \
        IMAGENET_STD.reshape(1, 1, 1, 3)


class ResNet50Trunk(nn.Module):
    """conv1..layer4 (no avgpool/fc), returns [B, M, M, 2048] fiber map.

    ``remat=True`` checkpoints each bottleneck block — cuts the large
    early-stage activation memory (the batch-size limiter at 512²) at the
    cost of recomputing block forwards in the backward pass.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = device_normalize(x)
        x = x.astype(self.dtype)
        x = StemConv(self.width, dtype=self.dtype, use_s2d=self.s2d_stem,
                     name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                blk = Bottleneck(features=features, stride=stride,
                                 downsample=(block == 0), dtype=self.dtype,
                                 name=f"layer{stage + 1}_{block}")
                if self.remat and train:
                    x = nn.remat(
                        lambda m, h: m(h, train=train),
                        static_argnums=())(blk, x)
                else:
                    x = blk(x, train=train)
        return x


def fibers(feature_map: jnp.ndarray) -> jnp.ndarray:
    """[B, M, M, C] -> [B, M*M, C] row-major — matches torch
    ``flatten(start_dim=2).transpose(1, 2)`` on a [B, C, M, M] map
    (reference: models/image.py:57-58)."""
    B, H, W, C = feature_map.shape
    return feature_map.reshape(B, H * W, C)


# torch AdaptiveAvgPool2d target shapes per num_image_embeds
# (reference: mmbt/models/image.py:30-39)
POOL_SHAPES = {1: (1, 1), 2: (2, 1), 3: (3, 1), 5: (5, 1), 7: (7, 1),
               4: (2, 2), 6: (3, 2), 8: (4, 2), 9: (3, 3)}


def adaptive_pool(fmap: jnp.ndarray, out_hw: Tuple[int, int],
                  mode: str = "avg") -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d``/``AdaptiveMaxPool2d`` semantics on an
    NHWC map: segment i of an H->oh reduction spans
    [floor(i*H/oh), ceil((i+1)*H/oh)).  Output [B, oh, ow, C].

    Static shapes: the (small) output grid is unrolled at trace time, so
    XLA sees a fixed set of slice+reduce ops — no dynamic control flow."""
    B, H, W, C = fmap.shape
    oh, ow = out_hw
    if H % oh == 0 and W % ow == 0:
        # uniform windows: one reduce_window the MXU/VPU pipeline likes
        kh, kw = H // oh, W // ow
        if mode == "avg":
            return nn.avg_pool(fmap, (kh, kw), strides=(kh, kw))
        return nn.max_pool(fmap, (kh, kw), strides=(kh, kw))
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -((-(i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -((-(j + 1) * W) // ow)
            seg = fmap[:, h0:h1, w0:w1, :]
            cols.append(seg.mean(axis=(1, 2)) if mode == "avg"
                        else seg.max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def pooled_fibers(fmap: jnp.ndarray, num_image_embeds: int,
                  pool_type: str = "avg") -> jnp.ndarray:
    """The 1-9-embed pool-config encoder: adaptive pool the trunk map to the
    reference's per-N target shape, then flatten row-major to [B, N, C]
    (reference: mmbt/models/image.py:16-56 — torch flattens [B,C,oh,ow] at
    dim 2 then transposes, which equals our NHWC reshape)."""
    if num_image_embeds not in POOL_SHAPES:
        raise ValueError(
            f"pool encoder defined for num_image_embeds in "
            f"{sorted(POOL_SHAPES)}, got {num_image_embeds}")
    out = adaptive_pool(fmap, POOL_SHAPES[num_image_embeds], pool_type)
    B, oh, ow, C = out.shape
    return out.reshape(B, oh * ow, C)


def half_pooled_fibers(fmap: jnp.ndarray,
                       pool_type: str = "avg") -> jnp.ndarray:
    """ImageEncoder_pool: pool the [B,M,M,C] map to (M//2, M//2) and
    flatten (reference: models/image.py:71-93)."""
    B, H, W, C = fmap.shape
    out = adaptive_pool(fmap, (H // 2, W // 2), pool_type)
    return out.reshape(B, (H // 2) * (W // 2), C)


def trainable_mask(params) -> dict:
    """Pytree of bools over the trunk: all False (entire trunk frozen).

    The reference *reads* like a partial freeze — freeze everything, then
    unfreeze ``list(self.img_encoder.children())[5:]`` — but that unfreeze
    loop is a no-op: ``ImageEncoder_cnn``'s only child is the single
    ``nn.Sequential`` wrapping conv1..layer4 (reference:
    models/image.py:46-52), so ``children()[5:] == []`` and the ENTIRE
    ResNet trunk stays ``requires_grad=False``
    (models/cxrbert_origin.py:65-70; the same no-op pattern at
    sc/pytorch_pretrained_bert/model.py:910-924,1066-1080).  We match the
    executed behavior, not the apparent intent: whole trunk frozen.
    BatchNorm running stats still update in train mode, exactly like torch
    (requires_grad does not gate running-stat EMA updates)."""
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    return flax.traverse_util.unflatten_dict({p: False for p in flat})


def cnn_freeze_mask(params, trunk_path: Sequence[str]):
    """Full-param-tree bool mask for the reference's unconditional CNN
    freeze: every CNN image-encoder model constructs with
    ``requires_grad=False`` on the whole trunk (see ``trainable_mask`` —
    the apparent children[5:] unfreeze is a no-op; reference:
    models/cxrbert_origin.py:65-70, models/image.py:46-52,
    sc/pytorch_pretrained_bert/model.py:910-924,1066-1080) — regardless of
    init source.  True everywhere except the trunk at ``trunk_path``."""
    import flax
    import jax

    flat = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda _: True, params))
    prefix = tuple(trunk_path)
    k = len(prefix)
    trunk_sub = {p[k:]: v for p, v in flat.items() if p[:k] == prefix}
    if not trunk_sub:
        raise ValueError(f"no params under trunk path {prefix}")
    sub_mask = flax.traverse_util.flatten_dict(
        trainable_mask(flax.traverse_util.unflatten_dict(trunk_sub)))
    out = {p: (sub_mask[p[k:]] if p[:k] == prefix else True) for p in flat}
    return flax.traverse_util.unflatten_dict(out)
