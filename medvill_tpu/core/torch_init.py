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
