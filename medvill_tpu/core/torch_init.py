"""End-to-end pretrained-weight ingestion from torch checkpoint files.

The reference initializes its visual encoder from torchvision ImageNet
ResNet-50 (``models/image.py:50`` ``torchvision.models.resnet50(pretrained)``)
and its language/joint encoder from a pretrained HF BERT
(``models/cxrbert_origin.py:42-55`` ``BertModel.from_pretrained``); downstream
stages load earlier-stage checkpoints through key remaps
(``sc/finetune.py:333-339``).  This module is the CLI-facing glue: a
``.pth``/``.bin`` path -> ``torch.load`` -> the numeric import shims in
``core.checkpoint`` -> a new param tree.

torch is only imported when a path is actually given, so the TPU runtime has
no torch dependency on the hot path.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Mapping, Sequence, Union

import numpy as np

from medvill_tpu.core import checkpoint as ckpt_lib

StateDict = Dict[str, np.ndarray]


def load_torch_state_dict(path: str) -> StateDict:
    """``torch.load`` a ``.pth``/``.bin``/``.pt`` file and return a flat
    {key: numpy array} dict.  Unwraps the common containers: a raw
    state_dict, ``{"state_dict": ...}`` (mmbt/main.py checkpoint dicts),
    ``{"model": ...}`` (sc/finetune.py model.N.bin)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping):
        for wrapper in ("state_dict", "model"):
            if wrapper in obj and isinstance(obj[wrapper], Mapping):
                obj = obj[wrapper]
                break
    out: StateDict = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
        # non-tensor entries (num_batches_tracked etc. are tensors; skip rest)
    return out


def _subtree(tree: dict, path: Sequence[str]) -> dict:
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_subtree(tree: dict, path: Sequence[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _strip_prefixes(sd: StateDict, markers=("conv1.weight",)) -> StateDict:
    """Find the torchvision-resnet key prefix (e.g. ``img_encoder.model.``
    inside a full-model checkpoint) and strip it."""
    for marker in markers:
        if marker in sd:
            return sd
        hits = [k for k in sd if k.endswith("." + marker)]
        if hits:
            prefix = hits[0][: -len(marker)]
            return {k[len(prefix):]: v for k, v in sd.items()
                    if k.startswith(prefix)}
    return sd


def init_resnet_from_torch(params: dict, batch_stats: dict,
                           sd_or_path: Union[str, StateDict],
                           trunk_path: Sequence[str] = ("enc", "img_encoder"),
                           ) -> tuple[dict, dict]:
    """Replace the ResNet-50 trunk subtree (params + batch_stats) with
    torchvision-pretrained weights (reference: models/image.py:50).

    Returns new (params, batch_stats) trees; shapes are verified leaf-by-leaf
    against the existing init so a wrong checkpoint fails loudly."""
    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else dict(sd_or_path))
    sd = _strip_prefixes(sd)
    imported = ckpt_lib.import_torchvision_resnet50(sd)
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    for tree, new in ((params, imported["params"]),
                      (batch_stats, imported["batch_stats"])):
        cur = _subtree(tree, trunk_path)
        _check_shapes(cur, new, where="/".join(trunk_path))
        _set_subtree(tree, trunk_path, new)
    return params, batch_stats


def init_bert_from_torch(params: dict, sd_or_path: Union[str, StateDict],
                         enc_key: str = "enc", num_layers: int = 12) -> dict:
    """Initialize the BERT embeddings/encoder/pooler under ``enc_key`` from
    an HF ``pytorch_model.bin`` (reference: cxrbert_origin.py:42-55,
    mmbt BertModel.from_pretrained).  Position-table and type-vocab size
    mismatches are adapted the way the reference's loaders do."""
    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else dict(sd_or_path))
    return ckpt_lib.load_hf_bert_into_joint(params, sd,
                                            num_layers=num_layers,
                                            enc_key=enc_key)


def _strip_module_prefix(sd: StateDict) -> StateDict:
    """nn.DataParallel saves with a ``module.`` prefix
    (reference trainer wraps the model, models/train_origin.py:53-55)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def _sequential_trunk_sd(sd: StateDict, prefix: str) -> StateDict:
    """Remap ``{prefix}.model.{i}...`` nn.Sequential keys to torchvision
    resnet50 names: 0=conv1, 1=bn1, 4..7=layer1..layer4 (the reference wraps
    ``list(resnet50.children())[:-2]`` in one Sequential,
    models/image.py:46-52)."""
    idx_to_name = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                   "6": "layer3", "7": "layer4"}
    out: StateDict = {}
    base = prefix + ".model."
    for k, v in sd.items():
        if not k.startswith(base):
            continue
        rest = k[len(base):]
        idx, _, tail = rest.partition(".")
        if idx not in idx_to_name:
            continue  # relu / maxpool have no params
        name = idx_to_name[idx]
        out[f"{name}.{tail}" if tail else name] = v
    return out


def _bert_sd_from_vendored(sd: StateDict, txt_prefix: str,
                           enc_prefix: str, pool_prefix: str) -> StateDict:
    """Collect txt_embeddings/encoder/pooler keys under the plain
    ``embeddings./encoder./pooler.`` names ``import_hf_bert`` expects."""
    out: StateDict = {}
    for k, v in sd.items():
        if k.startswith(txt_prefix + "."):
            out["embeddings." + k[len(txt_prefix) + 1:]] = v
        elif k.startswith(enc_prefix + "."):
            out["encoder." + k[len(enc_prefix) + 1:]] = v
        elif k.startswith(pool_prefix + "."):
            out["pooler." + k[len(pool_prefix) + 1:]] = v
    return out


def _set_checked(tree: dict, path: Sequence[str], value: np.ndarray) -> None:
    cur = _subtree(tree, path)
    if tuple(np.shape(cur)) != tuple(np.shape(value)):
        raise ValueError(f"{'/'.join(path)}: shape {np.shape(value)} != "
                         f"{np.shape(cur)}")
    _set_subtree(tree, path, np.asarray(value))


def init_cxrbert_from_torch(params: dict, batch_stats: dict,
                            sd_or_path: Union[str, StateDict],
                            enc_key: str = "enc") -> tuple[dict, dict]:
    """Ingest a full torch CXRBERT *pretrain* checkpoint (the published
    MedViLL weights) — the TPU equivalent of
    ``CXRBERT.from_pretrained(args.load_pretrained_model)`` wrapped by the
    retrieval model (reference: Downstream_task/Retrieval/retrieval.py:17-24).

    Torch key layout (models/cxrbert_origin.py:132-149):
    ``enc.txt_embeddings.* enc.img_embeddings.img_embeddings.*
    enc.img_encoder.model.{0,1,4..7}.* enc.encoder.layer.* enc.pooler.*
    mlm.predictions.* itm.linear.*``.
    """
    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else dict(sd_or_path))
    sd = _strip_module_prefix(sd)
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)

    n_layers = len(params[enc_key]["encoder"])
    bert_sd = _bert_sd_from_vendored(sd, "enc.txt_embeddings", "enc.encoder",
                                     "enc.pooler")
    if not bert_sd:
        raise ValueError("no enc.txt_embeddings/enc.encoder keys found — "
                         "not a CXRBERT pretrain checkpoint")
    params = ckpt_lib.load_hf_bert_into_joint(params, bert_sd,
                                              num_layers=n_layers,
                                              enc_key=enc_key)
    # image projection Linear(img_hidden, hidden)
    _set_checked(params, (enc_key, "img_projection", "kernel"),
                 np.asarray(sd["enc.img_embeddings.img_embeddings.weight"]).T)
    _set_checked(params, (enc_key, "img_projection", "bias"),
                 np.asarray(sd["enc.img_embeddings.img_embeddings.bias"]))
    # visual trunk
    trunk_sd = _sequential_trunk_sd(sd, "enc.img_encoder")
    if trunk_sd:
        params, batch_stats = init_resnet_from_torch(
            params, batch_stats, trunk_sd, trunk_path=(enc_key, "img_encoder"))
    # MLM head (BertPreTrainingHeads; decoder.weight is tied to the word
    # embeddings loaded above)
    if "mlm.predictions.transform.dense.weight" in sd:
        _set_checked(params, ("mlm", "transform_dense", "kernel"),
                     np.asarray(
                         sd["mlm.predictions.transform.dense.weight"]).T)
        _set_checked(params, ("mlm", "transform_dense", "bias"),
                     np.asarray(sd["mlm.predictions.transform.dense.bias"]))
        _set_checked(params, ("mlm", "transform_LayerNorm", "scale"),
                     np.asarray(
                         sd["mlm.predictions.transform.LayerNorm.weight"]))
        _set_checked(params, ("mlm", "transform_LayerNorm", "bias"),
                     np.asarray(
                         sd["mlm.predictions.transform.LayerNorm.bias"]))
        _set_checked(params, ("mlm", "decoder_bias"),
                     np.asarray(sd["mlm.predictions.bias"]))
    # ITM head (ImageTextMatching, cxrbert_origin.py:164-173)
    if "itm.linear.weight" in sd:
        _set_checked(params, ("itm", "linear", "kernel"),
                     np.asarray(sd["itm.linear.weight"]).T)
        _set_checked(params, ("itm", "linear", "bias"),
                     np.asarray(sd["itm.linear.bias"]))
    return params, batch_stats


def init_vlp_from_torch(params: dict, batch_stats: dict,
                        sd_or_path: Union[str, StateDict],
                        bert_key: str = "bert") -> tuple[dict, dict]:
    """Ingest a torch *finetune* checkpoint (``model.{epoch}.bin`` written by
    sc/finetune.py) into the VLP seq2seq model — the TPU equivalent of the
    decode entry's recover + key remap
    (reference: sc/generation_decode.py:377-410: prefixes txt_embeddings/
    img_embeddings/img_encoder.model/encoder.layer/pooler with ``bert.``
    then load_state_dict(strict=False)).

    Accepts keys with or without the ``bert.`` prefix; maps ``cls.*`` (MLM
    head incl. relax_projection-widened transforms) and ``ans_classifier.*``
    (VQA) when present.
    """
    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else dict(sd_or_path))
    sd = _strip_module_prefix(sd)
    # normalize to the UNprefixed finetune-save layout
    if any(k.startswith("bert.") for k in sd):
        sd = {(k[len("bert."):] if k.startswith("bert.") else k): v
              for k, v in sd.items()}
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)

    n_layers = len(params[bert_key]["encoder"])
    bert_sd = _bert_sd_from_vendored(sd, "txt_embeddings", "encoder",
                                     "pooler")
    if not bert_sd:
        raise ValueError("no txt_embeddings/encoder keys found — not a "
                         "VLP finetune checkpoint")
    params = ckpt_lib.load_hf_bert_into_joint(params, bert_sd,
                                              num_layers=n_layers,
                                              enc_key=bert_key)
    if "img_embeddings.img_embeddings.weight" in sd:
        _set_checked(params, (bert_key, "img_projection", "kernel"),
                     np.asarray(sd["img_embeddings.img_embeddings.weight"]).T)
        _set_checked(params, (bert_key, "img_projection", "bias"),
                     np.asarray(sd["img_embeddings.img_embeddings.bias"]))
    trunk_sd = _sequential_trunk_sd(sd, "img_encoder")
    if trunk_sd:
        params, batch_stats = init_resnet_from_torch(
            params, batch_stats, trunk_sd,
            trunk_path=(bert_key, "img_encoder"))
    if "cls.predictions.transform.dense.weight" in sd and "cls" in params:
        _set_checked(params, ("cls", "transform_dense", "kernel"),
                     np.asarray(
                         sd["cls.predictions.transform.dense.weight"]).T)
        _set_checked(params, ("cls", "transform_dense", "bias"),
                     np.asarray(sd["cls.predictions.transform.dense.bias"]))
        _set_checked(params, ("cls", "transform_LayerNorm", "scale"),
                     np.asarray(
                         sd["cls.predictions.transform.LayerNorm.weight"]))
        _set_checked(params, ("cls", "transform_LayerNorm", "bias"),
                     np.asarray(
                         sd["cls.predictions.transform.LayerNorm.bias"]))
        _set_checked(params, ("cls", "decoder_bias"),
                     np.asarray(sd["cls.predictions.bias"]))
    if "ans_classifier.0.weight" in sd and "ans_classifier" in params:
        _set_checked(params, ("ans_classifier", "fc1", "kernel"),
                     np.asarray(sd["ans_classifier.0.weight"]).T)
        _set_checked(params, ("ans_classifier", "fc1", "bias"),
                     np.asarray(sd["ans_classifier.0.bias"]))
        _set_checked(params, ("ans_classifier", "fc2", "kernel"),
                     np.asarray(sd["ans_classifier.2.weight"]).T)
        _set_checked(params, ("ans_classifier", "fc2", "bias"),
                     np.asarray(sd["ans_classifier.2.bias"]))
    return params, batch_stats


def init_cnn_bert_from_torch(params: dict, batch_stats: dict,
                             sd_or_path: Union[str, StateDict]
                             ) -> tuple[dict, dict]:
    """Ingest a torch CNN_BERT checkpoint (the late-fusion retrieval
    baseline — reference: full_dset_retrieval.py:549-555
    ``CNN_BERT.from_pretrained``; layout CNN_BERT/main_cnn_bert.py:124-195:
    ``txt_enc.txt_embeddings.* txt_enc.encoder.layer.* txt_enc.pooler.*
    img_enc.model.{0,1,4..7}.* linear.*``)."""
    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else dict(sd_or_path))
    sd = _strip_module_prefix(sd)
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)

    n_layers = len(params["txt_encoder"]["encoder"])
    bert_sd = _bert_sd_from_vendored(sd, "txt_enc.txt_embeddings",
                                     "txt_enc.encoder", "txt_enc.pooler")
    if not bert_sd:
        raise ValueError("no txt_enc.* keys found — not a CNN_BERT "
                         "checkpoint")
    params = ckpt_lib.load_hf_bert_into_joint(params, bert_sd,
                                              num_layers=n_layers,
                                              enc_key="txt_encoder")
    trunk_sd = _sequential_trunk_sd(sd, "img_enc")
    if trunk_sd:
        params, batch_stats = init_resnet_from_torch(
            params, batch_stats, trunk_sd,
            trunk_path=("img_encoder", "trunk"))
    if "linear.weight" in sd:
        # reference concat order cat([img_cls, txt_cls]) matches ours
        _set_checked(params, ("fc", "kernel"),
                     np.asarray(sd["linear.weight"]).T)
        _set_checked(params, ("fc", "bias"), np.asarray(sd["linear.bias"]))
    return params, batch_stats


def is_torch_checkpoint(path: str) -> bool:
    """A path names a torch checkpoint if it is a file (orbax checkpoints
    are directories) or a directory containing ``pytorch_model.bin``
    (HF save_pretrained layout, reference retrieval.py:19)."""
    import os

    if os.path.isfile(path):
        return True
    return os.path.isfile(os.path.join(path, "pytorch_model.bin"))


def partial_freeze_mask(params: dict, trunk_path: Sequence[str],
                        subtree_mask_fn) -> dict:
    """Full-tree bool mask: everything trainable except what
    ``subtree_mask_fn`` marks False inside the trunk subtree (the
    reference's pretrained-CNN partial freeze, cxrbert_origin.py:66-70)."""
    import jax

    full = jax.tree_util.tree_map(lambda _: True, params)
    sub = subtree_mask_fn(_subtree(params, trunk_path))
    full = copy.deepcopy(full)
    _set_subtree(full, trunk_path, sub)
    return full


def _check_shapes(cur: Any, new: Any, where: str) -> None:
    import jax

    cur_flat = jax.tree_util.tree_leaves_with_path(cur)
    new_map = dict(jax.tree_util.tree_leaves_with_path(new))
    if len(cur_flat) != len(new_map):
        raise ValueError(
            f"{where}: leaf count mismatch "
            f"({len(cur_flat)} vs {len(new_map)})")
    for path, leaf in cur_flat:
        if path not in new_map:
            raise ValueError(f"{where}: missing key {path}")
        if tuple(np.shape(new_map[path])) != tuple(np.shape(leaf)):
            raise ValueError(
                f"{where}{jax.tree_util.keystr(path)}: shape "
                f"{np.shape(new_map[path])} != {np.shape(leaf)}")
