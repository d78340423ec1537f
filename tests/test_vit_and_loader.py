"""ViT image-encoder path, sharded BatchLoader, Mixed variant stats."""
import dataclasses
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     MaskVariant, PretrainConfig)
from medvill_tpu.data.pretrain import (BatchLoader, CXRPretrainDataset,
                                       synthetic_records)
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import init_state, make_train_step


def test_vit_encoder_pretrain_step():
    """Img_patch_embedding path (reference: models/image.py:95-110,
    cxrbert_origin.py:60-63)."""
    cfg = PretrainConfig(
        seq_len=7,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(encoder="ViT", img_size=64, patch_size=32,
                                 num_image_embeds=4, img_hidden_size=32),
        batch_size=4, lr=1e-3)
    tx = optim.adamw(cfg.lr)
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    rng = np.random.default_rng(0)
    B, L_txt = 4, cfg.seq_len + 1
    batch = dict(
        cls_tok=jnp.asarray(np.full((B, 1), 2, np.int32)),
        input_txt=jnp.asarray(rng.integers(0, 64, (B, L_txt)).astype(
            np.int32)),
        txt_labels=jnp.asarray(np.where(
            rng.random((B, cfg.total_len)) < 0.15,
            rng.integers(0, 64, (B, cfg.total_len)), -100).astype(np.int32)),
        mask_spec=jnp.asarray(np.stack(
            [np.full(B, int(MaskVariant.BAR), np.int32),
             np.full(B, L_txt, np.int32)], -1)),
        segment=jnp.asarray(np.ones((B, L_txt), np.int32)),
        image=jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(
            np.float32)),
        is_aligned=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.int32)),
        sep_tok=jnp.asarray(np.full((B, 1), 3, np.int32)))
    step = jax.jit(make_train_step(model, tx, cfg))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_batch_loader_sharding_disjoint():
    data = [{"x": np.array([i])} for i in range(20)]
    shards = []
    for idx in range(2):
        loader = BatchLoader(data, 2, shuffle=True, seed=7, num_shards=2,
                             shard_index=idx)
        assert len(loader) == 5
        shards.append([int(v) for b in loader for v in b["x"].ravel()])
    assert set(shards[0]).isdisjoint(shards[1])
    assert sorted(shards[0] + shards[1]) == list(range(20))


def test_mixed_variant_distribution(tmp_path):
    tok = BertTokenizer(build_vocab([f"word{i}" for i in range(50)]))
    cfg = PretrainConfig(
        seq_len=7, bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3),
        bar_attn=False, mixed=True, s2s_prob=0.7, bi_prob=0.3)
    rng = np.random.default_rng(0)
    ds = CXRPretrainDataset(
        synthetic_records(200), tok, cfg, seed=0,
        image_loader=lambda p: rng.standard_normal((64, 64, 3)).astype(
            np.float32))
    variants = [int(ds[i]["mask_spec"][0]) for i in range(200)]
    n_s2s = sum(v == int(MaskVariant.S2S) for v in variants)
    n_full = sum(v == int(MaskVariant.FULL) for v in variants)
    assert n_s2s + n_full == 200
    assert 110 < n_s2s < 170  # ~70%
