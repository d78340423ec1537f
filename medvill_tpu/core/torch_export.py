"""Torch checkpoint export — the inverse of ``core.torch_init``.

The ingestion shims let reference users bring published MedViLL torch weights
here; this module closes the loop the other way: a checkpoint trained in this
framework exports to the reference's exact ``state_dict`` layouts, so the
reference's own downstream scripts can consume it unchanged —
``CXRBERT.from_pretrained`` for retrieval
(reference: Downstream_task/Retrieval/retrieval.py:17-24), the finetune
``--model_recover_path model.{N}.bin`` resume (sc/finetune.py:330-357), and
the decode entry's recover + ``bert.``-prefix remap
(sc/generation_decode.py:377-410 — which expects the UNprefixed finetune
layout this module writes).

Layouts produced (key names verified against the reference model defs):
- pretrain/CXRBERT (models/cxrbert_origin.py:132-149):
  ``enc.txt_embeddings.* enc.img_embeddings.img_embeddings.*
  enc.img_encoder.model.{0,1,4..7}.* enc.encoder.layer.* enc.pooler.*
  mlm.predictions.* itm.linear.*``
- finetune/VLP (sc/pytorch_pretrained_bert/model.py:903-927 module names,
  saved top-level by sc/finetune.py:474-487): ``txt_embeddings.*
  img_embeddings.img_embeddings.* img_encoder.model.* encoder.layer.*
  pooler.* cls.predictions.* ans_classifier.{0,2}.*``
- CNN_BERT baseline (CNN_BERT/main_cnn_bert.py:124-195):
  ``txt_enc.txt_embeddings.* txt_enc.encoder.layer.* txt_enc.pooler.*
  img_enc.model.* linear.*``

Tensor conventions inverted: Linear ``kernel``→``weight.T``; LayerNorm
``scale``→``weight``; Embed ``embedding``→``weight``; Conv HWIO→OIHW;
BatchNorm ``batch_stats`` mean/var→``running_mean``/``running_var`` (plus the
``num_batches_tracked`` counters torch checkpoints carry).  The tied MLM
decoder weight is materialized from the word-embedding table like torch's
``state_dict()`` does for tied parameters.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

StateDict = Dict[str, np.ndarray]


def _np(v) -> np.ndarray:
    a = np.asarray(v)
    if a.dtype not in (np.float32, np.float64, np.int32, np.int64):
        # bf16 (ml_dtypes) and f16 leaves: torch.from_numpy cannot take
        # ml_dtypes arrays — export float32 like the reference's fp32 saves
        a = a.astype(np.float32)
    return a


def _lin(out: StateDict, prefix: str, sub: dict) -> None:
    out[prefix + ".weight"] = _np(sub["kernel"]).T
    out[prefix + ".bias"] = _np(sub["bias"])


def _ln(out: StateDict, prefix: str, sub: dict) -> None:
    out[prefix + ".weight"] = _np(sub["scale"])
    out[prefix + ".bias"] = _np(sub["bias"])


def _emb(out: StateDict, prefix: str, sub: dict) -> None:
    out[prefix + ".weight"] = _np(sub["embedding"])


def _export_embeddings(out: StateDict, prefix: str, emb: dict) -> None:
    """BertEmbeddings -> ``{prefix}.{word,position,token_type}_embeddings`` +
    LayerNorm (HF naming, shared by all three reference model families)."""
    _emb(out, f"{prefix}.word_embeddings", emb["word_embeddings"])
    _emb(out, f"{prefix}.position_embeddings", emb["position_embeddings"])
    _emb(out, f"{prefix}.token_type_embeddings", emb["token_type_embeddings"])
    _ln(out, f"{prefix}.LayerNorm", emb["LayerNorm"])


def _export_encoder(out: StateDict, prefix: str, encoder: dict) -> None:
    """BertEncoder layers -> ``{prefix}.layer.{i}.*`` HF naming.  A fused
    ``self/qkv`` parameter (BertConfig.fused_qkv) is split back into the
    torch query/key/value linears (columns [0:H]=q [H:2H]=k [2H:3H]=v,
    the layout checkpoint.fuse_qkv_encoder writes)."""
    for i in range(len(encoder)):
        layer = encoder[f"layer_{i}"]
        lp = f"{prefix}.layer.{i}"
        s = layer["self"]
        if "qkv" in s:
            kernel = _np(s["qkv"]["kernel"])
            bias = _np(s["qkv"]["bias"])
            H = kernel.shape[0]
            for j, name in enumerate(("query", "key", "value")):
                out[f"{lp}.attention.self.{name}.weight"] = \
                    kernel[:, j * H:(j + 1) * H].T
                out[f"{lp}.attention.self.{name}.bias"] = \
                    bias[j * H:(j + 1) * H]
        else:
            for name in ("query", "key", "value"):
                _lin(out, f"{lp}.attention.self.{name}", s[name])
        _lin(out, f"{lp}.attention.output.dense",
             layer["attention_output"]["dense"])
        _ln(out, f"{lp}.attention.output.LayerNorm",
            layer["attention_output"]["LayerNorm"])
        _lin(out, f"{lp}.intermediate.dense", layer["intermediate"])
        _lin(out, f"{lp}.output.dense", layer["output_dense"])
        _ln(out, f"{lp}.output.LayerNorm", layer["output_LayerNorm"])


_TRUNK_SEQ_IDX = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                  "layer3": "6", "layer4": "7"}


def _export_trunk(out: StateDict, prefix: str, params: dict,
                  batch_stats: dict) -> None:
    """ResNet50Trunk -> torchvision names under the reference's
    ``nn.Sequential(list(resnet50.children())[:-2])`` wrapper indices
    (models/image.py:46-52): 0=conv1 1=bn1 4..7=layer1..4 — the exact
    inverse of torch_init._sequential_trunk_sd."""
    def conv(dst: str, sub: dict) -> None:
        out[dst + ".weight"] = _np(sub["kernel"]).transpose(3, 2, 0, 1)

    def bn(dst: str, p_sub: dict, s_sub: dict) -> None:
        out[dst + ".weight"] = _np(p_sub["scale"])
        out[dst + ".bias"] = _np(p_sub["bias"])
        out[dst + ".running_mean"] = _np(s_sub["mean"])
        out[dst + ".running_var"] = _np(s_sub["var"])
        out[dst + ".num_batches_tracked"] = np.zeros((), np.int64)

    base = prefix + ".model."
    conv(base + "0", params["conv1"])
    bn(base + "1", params["bn1"], batch_stats["bn1"])
    stage_sizes = [3, 4, 6, 3]
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            src = f"layer{stage + 1}_{block}"
            dst = f"{base}{_TRUNK_SEQ_IDX[f'layer{stage + 1}']}.{block}"
            bp, bs = params[src], batch_stats[src]
            for ci in (1, 2, 3):
                conv(f"{dst}.conv{ci}", bp[f"conv{ci}"])
                bn(f"{dst}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                conv(f"{dst}.downsample.0", bp["downsample_conv"])
                bn(f"{dst}.downsample.1", bp["downsample_bn"],
                   bs["downsample_bn"])


def _export_mlm_head(out: StateDict, prefix: str, head: dict,
                     word_embedding: np.ndarray) -> None:
    """MLMHead -> ``{prefix}.transform.{dense,LayerNorm}`` + tied
    ``decoder.weight`` + free ``bias`` (reference:
    cxrbert_origin.py:221-248 / model.py:454-496; relax_projection widths
    export as-is)."""
    _lin(out, f"{prefix}.transform.dense", head["transform_dense"])
    _ln(out, f"{prefix}.transform.LayerNorm", head["transform_LayerNorm"])
    out[f"{prefix}.decoder.weight"] = _np(word_embedding)
    out[f"{prefix}.bias"] = _np(head["decoder_bias"])


def _export_joint(out: StateDict, params: dict, batch_stats: dict,
                  emb_prefix: str, img_prefix: str | None,
                  trunk_prefix: str | None, enc_prefix: str,
                  pool_prefix: str) -> None:
    """``img_prefix``/``trunk_prefix`` of None skip the image path (the
    CNN_BERT text encoder has none)."""
    _export_embeddings(out, emb_prefix, params["embeddings"])
    if img_prefix is not None and "img_projection" in params:
        _lin(out, img_prefix, params["img_projection"])
    if trunk_prefix is not None and "img_encoder" in params \
            and "conv1" in params["img_encoder"]:
        if "img_encoder" not in batch_stats:
            raise ValueError(
                "checkpoint has ResNet trunk params but no batch_stats "
                "(BatchNorm running stats) — export needs the TrainState "
                "layout core.checkpoint.save writes, not a bare param tree")
        _export_trunk(out, trunk_prefix, params["img_encoder"],
                      batch_stats["img_encoder"])
    _export_encoder(out, enc_prefix, params["encoder"])
    if "pooler" in params:
        _lin(out, f"{pool_prefix}.dense", params["pooler"]["dense"])


def export_cxrbert_state_dict(params: dict, batch_stats: dict) -> StateDict:
    """CXRBERT pretrain checkpoint (the published-weights layout;
    inverse of torch_init.init_cxrbert_from_torch)."""
    out: StateDict = {}
    enc = params["enc"]
    _export_joint(out, enc, batch_stats.get("enc", {}),
                  emb_prefix="enc.txt_embeddings",
                  img_prefix="enc.img_embeddings.img_embeddings",
                  trunk_prefix="enc.img_encoder",
                  enc_prefix="enc.encoder", pool_prefix="enc.pooler")
    if "mlm" in params:
        _export_mlm_head(
            out, "mlm.predictions", params["mlm"],
            enc["embeddings"]["word_embeddings"]["embedding"])
    if "itm" in params:
        _lin(out, "itm.linear", params["itm"]["linear"])
    return out


def export_vlp_state_dict(params: dict, batch_stats: dict) -> StateDict:
    """VLP finetune checkpoint (``model.{N}.bin`` layout the reference's
    finetune resume and decode recover consume; inverse of
    torch_init.init_vlp_from_torch)."""
    out: StateDict = {}
    bert = params["bert"]
    _export_joint(out, bert, batch_stats.get("bert", {}),
                  emb_prefix="txt_embeddings",
                  img_prefix="img_embeddings.img_embeddings",
                  trunk_prefix="img_encoder",
                  enc_prefix="encoder", pool_prefix="pooler")
    if "cls" in params:
        _export_mlm_head(
            out, "cls.predictions", params["cls"],
            bert["embeddings"]["word_embeddings"]["embedding"])
    if "ans_classifier" in params:
        _lin(out, "ans_classifier.0", params["ans_classifier"]["fc1"])
        _lin(out, "ans_classifier.2", params["ans_classifier"]["fc2"])
    return out


def export_cnn_bert_state_dict(params: dict, batch_stats: dict) -> StateDict:
    """CNN_BERT late-fusion baseline checkpoint (inverse of
    torch_init.init_cnn_bert_from_torch)."""
    out: StateDict = {}
    _export_joint(out, params["txt_encoder"],
                  batch_stats.get("txt_encoder", {}),
                  emb_prefix="txt_enc.txt_embeddings",
                  img_prefix=None, trunk_prefix=None,
                  enc_prefix="txt_enc.encoder", pool_prefix="txt_enc.pooler")
    if "img_encoder" in params:
        trunk_stats = batch_stats.get("img_encoder", {}).get("trunk")
        if trunk_stats is None:
            raise ValueError(
                "CNN_BERT checkpoint has trunk params but no batch_stats — "
                "export needs the TrainState layout core.checkpoint.save "
                "writes, not a bare param tree")
        _export_trunk(out, "img_enc", params["img_encoder"]["trunk"],
                      trunk_stats)
    if "fc" in params:
        _lin(out, "linear", params["fc"])
    return out


def export_mmbt_state_dict(params: dict, batch_stats: dict) -> StateDict:
    """MMBT classification checkpoint (MultimodalBertClf layout,
    Classification/mmbt/models/mmbt.py:45-114: ``enc.txt_embeddings.*
    enc.img_embeddings.img_embeddings.* enc.img_encoder.model.*
    enc.encoder.layer.* enc.pooler.* clf.*``; the reference's inner
    ``enc.clf`` Linear is never used in forward and is not exported)."""
    out: StateDict = {}
    _export_joint(out, params["enc"], batch_stats.get("enc", {}),
                  emb_prefix="enc.txt_embeddings",
                  img_prefix="enc.img_embeddings.img_embeddings",
                  trunk_prefix="enc.img_encoder",
                  enc_prefix="enc.encoder", pool_prefix="enc.pooler")
    if "clf" in params:
        _lin(out, "clf", params["clf"]["clf"])
    return out


def detect_kind(params: dict) -> str:
    """Infer which reference layout a restored param tree maps to."""
    if "enc" in params and ("mlm" in params or "itm" in params):
        return "pretrain"
    if "enc" in params and "clf" in params:
        return "mmbt"
    if "bert" in params:
        return "finetune"
    if "txt_encoder" in params:
        return "cnn_bert"
    raise ValueError(
        f"unrecognized param tree (top-level keys {sorted(params)}) — "
        "expected a CXRBERT pretrain / MMBT / VLP finetune / CNN_BERT state")


EXPORTERS = {"pretrain": export_cxrbert_state_dict,
             "finetune": export_vlp_state_dict,
             "mmbt": export_mmbt_state_dict,
             "cnn_bert": export_cnn_bert_state_dict}


def to_torch_tensors(sd: StateDict) -> dict:
    """Flat numpy state_dict -> torch tensors (shared by the save path and
    the reference-parity tests so both apply the same copy/dtype rule)."""
    import torch

    # copy=True: jax device_get arrays are non-writable and torch tensors
    # cannot alias them
    return {k: torch.from_numpy(np.array(v, copy=True))
            for k, v in sd.items()}


def save_torch_checkpoint(sd: StateDict, path: str) -> None:
    """``torch.save`` a flat numpy state_dict as tensors (the format every
    reference ``torch.load`` site reads)."""
    import torch

    torch.save(to_torch_tensors(sd), path)
