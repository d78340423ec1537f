"""Numerical parity vs the actual torch substrate (SURVEY.md §4).

torch (CPU) is available in the image, so these tests build *random-init*
torch modules with the reference's exact architecture, export their
state_dicts through our import shims, and compare forward outputs
numerically.  This validates both the shims and our module semantics
(conv/BN topology, post-LN transformer, GELU flavor, masking arithmetic,
loss definitions) against the real thing — no network needed.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core import checkpoint as C
from medvill_tpu.core.config import BertConfig


def to_np(t):
    return t.detach().cpu().numpy()


class TorchBottleneck(torch.nn.Module):
    """torchvision-v1.5 bottleneck (stride on conv2), minimal rebuild so the
    test doesn't require torchvision."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                     padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                                bias=False),
                torch.nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet50Trunk(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        layers = []
        inplanes = 64
        for stage, (n, w) in enumerate(zip([3, 4, 6, 3],
                                           [64, 128, 256, 512])):
            blocks = []
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(TorchBottleneck(inplanes, w, stride=stride,
                                              downsample=(b == 0)))
                inplanes = w * 4
            layers.append(torch.nn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    def torchvision_style_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("downsample.0", "downsample.0").replace(
                "layer", "layer")
            sd[k] = v
        return sd


def test_resnet50_forward_parity():
    torch.manual_seed(0)
    tm = TorchResNet50Trunk().eval()
    sd = {k: v for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    imported = C.import_torchvision_resnet50(sd)

    from medvill_tpu.models.resnet import ResNet50Trunk

    model = ResNet50Trunk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = to_np(tm(torch.tensor(x.transpose(0, 3, 1, 2))))  # NCHW
    got = model.apply({"params": imported["params"],
                       "batch_stats": imported["batch_stats"]},
                      jnp.asarray(x), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def _tiny_hf_bert():
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig as HFConfig
    from transformers import BertModel as HFBert

    hf_cfg = HFConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, type_vocab_size=2,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    return HFBert(hf_cfg).eval(), hf_cfg


def test_bert_encoder_forward_parity():
    tm, hf_cfg = _tiny_hf_bert()
    sd = {k: v for k, v in tm.state_dict().items()}
    imported = C.import_hf_bert(sd, num_layers=2)

    from medvill_tpu.models.bert import (BertEmbeddings, BertEncoder,
                                         BertPooler)
    import flax.linen as nn

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, compute_dtype="float32")

    class Wrapper(nn.Module):
        @nn.compact
        def __call__(self, ids, type_ids, bias):
            x = BertEmbeddings(cfg, name="embeddings")(ids, type_ids)
            h, _ = BertEncoder(cfg, name="encoder")(x, bias)
            pooled = BertPooler(cfg, name="pooler")(h)
            return h, pooled

    model = Wrapper()
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 64, (2, 10)).astype(np.int32)
    type_ids = np.zeros((2, 10), np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(type_ids), None)
    # graft imported params
    params = dict(variables["params"])
    params["embeddings"] = imported["embeddings"]
    params["encoder"] = imported["encoder"]
    params["pooler"] = imported["pooler"]
    got_h, got_p = model.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(type_ids), None)
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids.astype(np.int64)),
                 token_type_ids=torch.tensor(type_ids.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(got_h), to_np(out.last_hidden_state),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), to_np(out.pooler_output),
                               rtol=2e-4, atol=2e-4)


def test_bert_masking_parity():
    """Our (1-m)*-10000 additive bias must reproduce HF's masked attention
    for a padding mask."""
    tm, _ = _tiny_hf_bert()
    sd = tm.state_dict()
    imported = C.import_hf_bert(sd, num_layers=2)

    from medvill_tpu.models.bert import BertEmbeddings, BertEncoder
    import flax.linen as nn

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, compute_dtype="float32")

    class Wrapper(nn.Module):
        @nn.compact
        def __call__(self, ids, type_ids, bias):
            x = BertEmbeddings(cfg, name="embeddings")(ids, type_ids)
            h, _ = BertEncoder(cfg, name="encoder")(x, bias)
            return h

    model = Wrapper()
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 64, (2, 10)).astype(np.int32)
    type_ids = np.zeros((2, 10), np.int32)
    mask_1d = np.ones((2, 10), np.float32)
    mask_1d[:, 7:] = 0.0
    bias = ((1.0 - mask_1d) * -10000.0)[:, None, None, :]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(type_ids), jnp.asarray(bias))
    params = dict(variables["params"])
    params["embeddings"] = imported["embeddings"]
    params["encoder"] = imported["encoder"]
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(type_ids), jnp.asarray(bias))
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids.astype(np.int64)),
                 token_type_ids=torch.tensor(type_ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask_1d))
    # valid positions must agree (HF uses dtype-min instead of -10000 in
    # newer versions; effect on valid rows is identical at these scales)
    np.testing.assert_allclose(np.asarray(got)[:, :7],
                               to_np(out.last_hidden_state)[:, :7],
                               rtol=2e-4, atol=2e-4)


def test_cross_entropy_vs_torch():
    from medvill_tpu.train.losses import cross_entropy_ignore_index

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((4, 6, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (4, 6))
    labels[rng.random((4, 6)) < 0.5] = -100
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits).permute(0, 2, 1), torch.tensor(labels),
        ignore_index=-100).item()
    got, _ = cross_entropy_ignore_index(jnp.asarray(logits),
                                        jnp.asarray(labels))
    assert float(got) == pytest.approx(want, rel=1e-5)


def test_bce_pos_weight_vs_torch():
    from medvill_tpu.train.losses import weighted_bce_with_logits

    rng = np.random.default_rng(4)
    logits = rng.standard_normal((5, 3)).astype(np.float32)
    targets = (rng.random((5, 3)) > 0.5).astype(np.float32)
    pw = np.array([0.5, 2.0, 3.0], np.float32)
    want = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(logits), torch.tensor(targets)).item()
    got = float(weighted_bce_with_logits(jnp.asarray(logits),
                                         jnp.asarray(targets),
                                         jnp.asarray(pw)))
    assert got == pytest.approx(want, rel=1e-5)


def test_label_smoothing_vs_torch_kldiv():
    """Reference LabelSmoothingLoss = KLDiv(log_softmax, smoothed one-hot)
    with ignore zeroing (sc/pytorch_pretrained_bert/loss.py:12-48)."""
    from medvill_tpu.train.losses import label_smoothing_loss

    rng = np.random.default_rng(5)
    V, eps = 8, 0.1
    logits = rng.standard_normal((3, 4, V)).astype(np.float32)
    labels = rng.integers(0, V, (3, 4))
    got = np.asarray(label_smoothing_loss(jnp.asarray(logits),
                                          jnp.asarray(labels), eps, V,
                                          ignore_index=0))
    tlogp = torch.log_softmax(torch.tensor(logits), dim=-1)
    conf, low = 1.0 - eps, eps / (V - 2)
    td = torch.full((3, 4, V), low)
    td.scatter_(2, torch.tensor(labels)[..., None], conf)
    td[:, :, 0] = 0.0
    mask = torch.tensor(labels) == 0
    td[mask] = 0.0
    want = torch.nn.functional.kl_div(tlogp, td,
                                      reduction="none").sum(-1)
    np.testing.assert_allclose(got, to_np(want), rtol=1e-4, atol=1e-5)
