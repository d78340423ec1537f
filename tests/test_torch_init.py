"""End-to-end pretrained-weight ingestion: a real torch checkpoint FILE goes
through ``torch.load`` -> the import shims -> a model param tree, exactly the
path the CLI flags (--bert_init_path / --resnet_init_path) drive.

Reference behavior being reproduced: torchvision ImageNet ResNet-50 init
(models/image.py:50), HF BERT init (models/cxrbert_origin.py:42-55), and the
partial CNN freeze on pretrained init (cxrbert_origin.py:66-70).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from medvill_tpu.core import torch_init
from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import init_state

from tests.test_torch_parity import TorchResNet50Trunk, to_np


@pytest.fixture(scope="module")
def tiny_state():
    cfg = PretrainConfig(
        batch_size=2, seq_len=7,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=3))
    _, state = init_state(cfg, jax.random.PRNGKey(0),
                          optim.adamw(1e-3))
    return cfg, state


@pytest.mark.slow
def test_resnet_ingestion_from_file(tiny_state, tmp_path):
    cfg, state = tiny_state
    torch.manual_seed(0)
    tm = TorchResNet50Trunk().eval()
    path = os.path.join(tmp_path, "resnet50.pth")
    torch.save(tm.state_dict(), path)

    new_params, new_bs = torch_init.init_resnet_from_torch(
        state.params, state.batch_stats, path,
        trunk_path=("enc", "img_encoder"))

    # trunk forward through the ingested tree matches torch
    from medvill_tpu.models.resnet import ResNet50Trunk

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = to_np(tm(torch.tensor(x.transpose(0, 3, 1, 2))))
    got = ResNet50Trunk(dtype=jnp.float32).apply(
        {"params": new_params["enc"]["img_encoder"],
         "batch_stats": new_bs["enc"]["img_encoder"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-3)
    # everything outside the trunk untouched
    np.testing.assert_array_equal(
        np.asarray(state.params["enc"]["embeddings"]["word_embeddings"]
                   ["embedding"]),
        np.asarray(new_params["enc"]["embeddings"]["word_embeddings"]
                   ["embedding"]))


@pytest.mark.slow
def test_resnet_ingestion_prefixed_checkpoint(tiny_state, tmp_path):
    """Full-model checkpoints carry the trunk under a prefix
    (e.g. ``enc.img_encoder.model.conv1.weight``); the loader strips it."""
    cfg, state = tiny_state
    torch.manual_seed(1)
    tm = TorchResNet50Trunk()
    sd = {"enc.model." + k: v for k, v in tm.state_dict().items()}
    path = os.path.join(tmp_path, "full_model.pt")
    torch.save({"state_dict": sd}, path)
    new_params, _ = torch_init.init_resnet_from_torch(
        state.params, state.batch_stats, path,
        trunk_path=("enc", "img_encoder"))
    np.testing.assert_allclose(
        np.asarray(new_params["enc"]["img_encoder"]["conv1"]["kernel"]),
        to_np(tm.conv1.weight).transpose(2, 3, 1, 0), rtol=1e-6)


@pytest.mark.slow
def test_bert_ingestion_from_file(tiny_state, tmp_path):
    cfg, state = tiny_state
    from tests.test_torch_parity import _tiny_hf_bert

    tm, hf_cfg = _tiny_hf_bert()
    path = os.path.join(tmp_path, "pytorch_model.bin")
    torch.save(tm.state_dict(), path)
    new_params = torch_init.init_bert_from_torch(
        state.params, path, enc_key="enc",
        num_layers=cfg.bert.num_hidden_layers)
    np.testing.assert_allclose(
        np.asarray(new_params["enc"]["embeddings"]["word_embeddings"]
                   ["embedding"]),
        to_np(tm.embeddings.word_embeddings.weight), rtol=1e-6)
    # position table resized 32 -> 512 (model.py:670-687 trick)
    assert np.asarray(new_params["enc"]["embeddings"]["position_embeddings"]
                      ["embedding"]).shape[0] == \
        cfg.bert.max_position_embeddings


@pytest.mark.slow
def test_partial_freeze_mask(tiny_state):
    cfg, state = tiny_state
    from medvill_tpu.models import resnet as resnet_lib

    mask = torch_init.partial_freeze_mask(
        state.params, ("enc", "img_encoder"), resnet_lib.trainable_mask)
    trunk = mask["enc"]["img_encoder"]
    # the whole trunk is frozen (the reference's children()[5:] unfreeze is
    # a no-op — models/image.py:46-52); everything outside stays trainable
    assert all(v is False for v in jax.tree_util.tree_leaves(trunk))
    assert mask["enc"]["embeddings"]["word_embeddings"]["embedding"] is True
    # the masked optimizer really zeroes frozen updates
    tx = optim.masked_trainable(optim.adamw(1e-2), mask)
    opt_state = tx.init(state.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    upd, _ = tx.update(grads, opt_state, state.params)
    assert float(jnp.abs(upd["enc"]["img_encoder"]["conv1"]["kernel"]).max()
                 ) == 0.0
    assert float(jnp.abs(upd["enc"]["embeddings"]["word_embeddings"]
                         ["embedding"]).max()) > 0.0


@pytest.mark.slow
def test_wrong_checkpoint_fails_loudly(tiny_state, tmp_path):
    cfg, state = tiny_state
    sd = {"conv1.weight": torch.zeros(64, 3, 3, 3)}  # wrong stem shape
    path = os.path.join(tmp_path, "bad.pth")
    torch.save(sd, path)
    with pytest.raises((ValueError, KeyError)):
        torch_init.init_resnet_from_torch(
            state.params, state.batch_stats, path,
            trunk_path=("enc", "img_encoder"))
