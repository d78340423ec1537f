"""Measured same-host reference comparison (CPU-normalized).

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
``vs_baseline`` uses a documented A100-equivalent estimate.  This script adds
a *measured* figure on the one hardware both sides can run on in this image —
the host CPU: it executes the reference's own pretrain train step (the actual
``models/cxrbert_origin.py`` CXRBERT imported from /root/reference, AdamW +
CE losses exactly as ``models/train_origin.py:60-63,106-131``) and our JAX
pretrain step at the identical config point, and reports both in pairs/sec.

The reference code is imported, never copied.  Three runtime shims are needed
because the image lacks the reference's pinned environment:
  * ``transformers.modeling_bert`` (v3 layout) -> aliased to the modern
    ``transformers.models.bert.modeling_bert`` module;
  * ``BertConfig.from_pretrained`` (zero egress) -> default ``BertConfig()``
    (identical to bert-base-uncased: 12L/12H/768, vocab 30522);
  * ``torchvision`` (absent) -> a module exposing ``models.resnet50`` with
    torchvision's exact children order ([conv1,bn1,relu,maxpool,layer1..4,
    avgpool,fc]) so the reference's ``children()[:-2]`` slicing works
    (models/image.py:51-52); random init — irrelevant for throughput.
  * ``Tensor.cuda()`` -> identity (the reference hardcodes .cuda() in
    forward, cxrbert_origin.py:115-117).

Usage: python bench_ref_cpu.py [batch] [iters]   (defaults 2, 3)
Writes REFBENCH.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time
import types

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
IMG = 512
NUM_IMG_EMBEDS = 180
SEQ_LEN = 253
TOTAL_LEN = SEQ_LEN + NUM_IMG_EMBEDS + 3  # 436 (dataset_origin.py:37)
VOCAB = 30522


def _install_shims():
    import torch
    import torch.nn as nn
    import transformers
    import transformers.models.albert.modeling_albert as malbert
    import transformers.models.auto.modeling_auto as mauto
    import transformers.models.bert.modeling_bert as mbert

    # v3-era module layout
    sys.modules["transformers.modeling_bert"] = mbert
    sys.modules["transformers.modeling_auto"] = mauto
    sys.modules["transformers.modeling_albert"] = malbert
    # zero-egress config (defaults == bert-base-uncased)
    mbert.BertConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: cls())
    # transformers 4.x dropped AdamW from .optimization (train_origin.py:15
    # imports it at module scope); alias torch's
    import transformers.optimization as topt
    if not hasattr(topt, "AdamW"):
        topt.AdamW = torch.optim.AdamW
    # .cuda() hardcoded in reference forward
    torch.Tensor.cuda = lambda self, *a, **k: self

    # minimal torchvision: resnet50 with torchvision's children order
    class _Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + identity)

    class _ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, 3)
            self.layer2 = self._make_layer(128, 4, stride=2)
            self.layer3 = self._make_layer(256, 6, stride=2)
            self.layer4 = self._make_layer(512, 3, stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(2048, 1000)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [_Bottleneck(self.inplanes, planes)
                       for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):  # unused (reference slices children)
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet50 = lambda pretrained=False, **k: _ResNet50()
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models

    # absent-from-image deps pulled in by models/__init__.py side imports
    # (wandb logging, tqdm bars, fuzzywuzzy sampling) — stubbed; the
    # benchmark touches none of their functionality
    for name in ("wandb", "tqdm", "fuzzywuzzy"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.__getattr__ = lambda attr, _n=name: (
                    (lambda *a, **k: None))
                if name == "tqdm":
                    stub.tqdm = lambda it, **k: it
                if name == "fuzzywuzzy":
                    fuzz = types.ModuleType("fuzzywuzzy.fuzz")
                    fuzz.token_sort_ratio = lambda a, b: 0
                    stub.fuzz = fuzz
                    sys.modules["fuzzywuzzy.fuzz"] = fuzz
                sys.modules[name] = stub


def bench_reference() -> float:
    """Reference train step (train_origin.py:106-131) on host CPU."""
    import numpy as np
    import torch

    _install_shims()
    sys.path.insert(0, "/root/reference")
    from models.cxrbert_origin import CXRBERT
    from transformers.models.bert.modeling_bert import BertConfig

    args = types.SimpleNamespace(
        bert_model="bert-base-scratch", img_encoder="random-pixel",
        img_hidden_sz=2048, embedding_size=768, hidden_size=768,
        dropout_prob=0.1, img_postion=True, disturbing_mask=False,
        num_image_embeds=NUM_IMG_EMBEDS, img_size=IMG, vocab_size=VOCAB,
        img_channel=3, seq_len=SEQ_LEN)
    config = BertConfig()
    model = CXRBERT(config, args)
    model.train()
    # the reference freezes torchvision children [:5]
    # (cxrbert_origin.py:66-70) inside the constructor already
    opt = torch.optim.AdamW(model.parameters(), lr=1e-5)
    mlm_crit = torch.nn.CrossEntropyLoss(ignore_index=-100)
    itm_crit = torch.nn.CrossEntropyLoss()

    rng = np.random.default_rng(0)
    B = BATCH
    cls_tok = torch.full((B, 1), 101, dtype=torch.long)
    sep_tok = torch.full((B, 1), 102, dtype=torch.long)
    input_txt = torch.as_tensor(
        rng.integers(0, VOCAB, (B, SEQ_LEN + 1)), dtype=torch.long)
    segment = torch.ones((B, SEQ_LEN + 1), dtype=torch.long)
    attn_mask = torch.ones((B, TOTAL_LEN, TOTAL_LEN), dtype=torch.long)
    img = torch.as_tensor(
        rng.standard_normal((B, 3, IMG, IMG)), dtype=torch.float32)
    txt_labels = torch.as_tensor(
        np.where(rng.random((B, TOTAL_LEN)) < 0.15,
                 rng.integers(0, VOCAB, (B, TOTAL_LEN)), -100),
        dtype=torch.long)
    is_aligned = torch.as_tensor(rng.integers(0, 2, (B,)), dtype=torch.long)

    def step():
        mlm_out, itm_out = model(cls_tok, input_txt, attn_mask, segment,
                                 img, sep_tok)
        loss = (mlm_crit(mlm_out.transpose(1, 2), txt_labels)
                + itm_crit(itm_out, is_aligned))
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step()
    dt = time.perf_counter() - t0
    return B * ITERS / dt


def bench_ours_cpu() -> float:
    """Our pretrain step, same config point, forced onto the host CPU."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import dataclasses

    import jax

    # the TPU image's site hook force-selects the axon platform via
    # jax.config — the env var alone is not enough
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb
    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends
        clear_backends()
    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp
    import numpy as np

    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.models import resnet as resnet_lib
    from medvill_tpu.train import optim
    from medvill_tpu.train.pretrain import init_state, make_train_step

    cfg = PretrainConfig(
        batch_size=BATCH,
        # f32 compute: bf16 is the TPU-native policy but is EMULATED in
        # software on x86 — the torch side runs f32 through oneDNN/AVX512,
        # so f32-vs-f32 is the honest same-host comparison
        bert=dataclasses.replace(BertConfig.base(), remat=False,
                                 compute_dtype="float32"),
        image=ImageEncoderConfig(img_size=IMG,
                                 num_image_embeds=NUM_IMG_EMBEDS),
        mlm_loss_chunk=128,
        # the Pallas kernel is TPU-only; CPU interpret mode is not a perf
        # path — use the XLA attention like any CPU run would
        use_flash_attention=False)
    tx = optim.adamw(cfg.lr, cfg.beta1, cfg.beta2, cfg.eps, cfg.weight_decay)
    tx = optim.masked_trainable(
        tx, lambda p: resnet_lib.cnn_freeze_mask(
            p, ("enc", "img_encoder")))
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)

    rng = np.random.default_rng(0)
    B, L_txt = BATCH, cfg.seq_len + 1
    batch = dict(
        cls_tok=np.full((B, 1), 101, np.int32),
        input_txt=rng.integers(0, VOCAB, (B, L_txt)).astype(np.int32),
        txt_labels=np.where(rng.random((B, cfg.total_len)) < 0.15,
                            rng.integers(0, VOCAB, (B, cfg.total_len)),
                            -100).astype(np.int32),
        mask_spec=np.stack([np.full(B, 2, np.int32),
                            np.full(B, L_txt, np.int32)], -1),
        segment=np.ones((B, L_txt), np.int32),
        image=rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32),
        is_aligned=rng.integers(0, 2, (B,)).astype(np.int32),
        sep_tok=np.full((B, 1), 102, np.int32),
    )
    dev_batch = jax.tree_util.tree_map(jnp.asarray, batch)
    key = jax.random.PRNGKey(1)
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    state, m = step(state, dev_batch, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, dev_batch, key)
        _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def main() -> None:
    which = os.environ.get("REFBENCH_SIDE", "")
    if which == "ref":
        print(json.dumps({"ref_cpu_pairs_per_sec": bench_reference()}))
        return
    if which == "ours":
        print(json.dumps({"ours_cpu_pairs_per_sec": bench_ours_cpu()}))
        return
    # run each side in its own process so torch/jax thread pools don't
    # interfere
    import subprocess

    results = {}
    for side, key in (("ref", "ref_cpu_pairs_per_sec"),
                      ("ours", "ours_cpu_pairs_per_sec")):
        env = dict(os.environ, REFBENCH_SIDE=side)
        out = subprocess.run(
            [sys.executable, __file__, str(BATCH), str(ITERS)], env=env,
            capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"{side} failed:\n{out.stdout}\n{out.stderr}")
        results.update(json.loads(line[-1]))
    results["cpu_speedup_ours_vs_ref"] = round(
        results["ours_cpu_pairs_per_sec"] / results["ref_cpu_pairs_per_sec"],
        3)
    results["config"] = {"batch": BATCH, "iters": ITERS, "img": IMG,
                         "num_image_embeds": NUM_IMG_EMBEDS,
                         "seq_len": SEQ_LEN, "host": "cpu"}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "REFBENCH.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
