"""Checkpointing: one orbax format + import shims for the reference's three
torch conventions.

Reference conventions (SURVEY.md §5):
(a) HF ``save_pretrained`` per epoch into ``output/<ts>/<epoch>/``
    (models/train_origin.py:254-266);
(b) monolithic dict {epoch, state_dict, optimizer, scheduler, ...} +
    ``model_best.pt`` copy (utils/utils.py:18-26, mmbt/main.py:319-330);
(c) ``model.{N}.bin`` / ``optim.{N}.bin`` + config.json, rank-0 only
    (sc/finetune.py:474-487) with resume-by-scan
    (``_get_max_epoch_model``, finetune.py:37-47).

Here: orbax ``StandardCheckpointer`` writes the full TrainState per epoch into
``<dir>/<epoch>``; `latest_epoch` reproduces resume-by-scan; torch->jax key
remapping lives in `torch_remap` (mirroring finetune.py:333-339 ``enc.->''``,
``mlm.->cls.`` and generation_decode.py:384-388 ``->bert.*``).
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


_ASYNC_CKPT = None


def fully_addressable(state: Any) -> bool:
    """True when every array leaf is fully addressable from this process
    (single-process runs, or multi-process with purely replicated state).
    False when shards live on other hosts — e.g. ZeRO-1 moments sharded
    over a data axis that spans processes."""
    for leaf in jax.tree_util.tree_leaves(state):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return False
    return True


def rank0_savable(state: Any) -> bool:
    """True when rank 0 alone can materialize the complete state: every
    array leaf is fully addressable (single-process) or fully replicated
    (plain multi-host data parallelism — each host holds the whole value,
    so ``np.asarray`` is legal without cross-host gathers)."""
    for leaf in jax.tree_util.tree_leaves(state):
        if (isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
                and not leaf.is_fully_replicated):
            return False
    return True


def is_saving_process(state: Any) -> bool:
    """Which processes must call :func:`save` for this state.

    Rank-0-savable state (fully addressable or fully replicated): rank 0
    only (the reference's rank-0 convention, sc/finetune.py:474-487 —
    avoids duplicate writes and works on per-host local disks).
    Cross-process-sharded state (ZeRO-1/TP over multiple hosts): EVERY
    process, so orbax's distributed array writer can commit each host's
    shards (requires a filesystem all hosts see, the standard pod setup)."""
    return jax.process_index() == 0 or not rank0_savable(state)


def save(directory: str, epoch: int, state: Any,
         config: Optional[dict] = None, best: bool = False,
         async_save: bool = False) -> str:
    """Save state under <directory>/<epoch>; optionally copy to 'best'
    (the reference's model_best.pt convention, utils/utils.py:18-22).

    ``async_save=True`` returns as soon as the device arrays are snapshotted
    and writes in the background (orbax async; the next save waits for the
    previous one) — training is not blocked on filesystem I/O.

    Cross-process-sharded state is passed to orbax as live jax.Arrays (its
    distributed writer commits per-host shards); ``jax.device_get`` of such
    a tree would raise.  All processes must then call save — see
    :func:`is_saving_process`.
    """
    global _ASYNC_CKPT
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, str(epoch))
    if fully_addressable(state):
        host_state = jax.device_get(state)
    elif rank0_savable(state):
        # multi-process but fully replicated: np.asarray is legal on
        # is_fully_replicated arrays — rank 0 writes one complete
        # checkpoint to its own disk, matching the reference convention
        host_state = jax.tree_util.tree_map(
            lambda l: np.asarray(l) if isinstance(l, jax.Array) else l,
            state)
    else:
        host_state = state
    rank0 = jax.process_index() == 0
    if async_save and not best:  # best-copy needs the finished write
        if _ASYNC_CKPT is None:
            _ASYNC_CKPT = _checkpointer()
        ckpt = _ASYNC_CKPT
        ckpt.wait_until_finished()  # at most one write in flight
        ckpt.save(path, host_state, force=True)
        if config is not None and rank0:
            with open(os.path.join(directory, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        return path
    ckpt = _checkpointer()
    ckpt.save(path, host_state, force=True)
    ckpt.wait_until_finished()
    if config is not None and rank0:
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    if best and rank0:
        best_path = os.path.join(directory, "best")
        if os.path.exists(best_path):
            shutil.rmtree(best_path)
        shutil.copytree(path, best_path)
    return path


def restore(directory: str, epoch: int | str, target: Any,
            partial: bool = False) -> Any:
    """Restore a checkpoint.  ``partial=True`` restores only the subtrees
    present in ``target`` (e.g. params without optimizer state — the decode
    CLI's inference-only load)."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), str(epoch))
    if not partial:
        return _checkpointer().restore(path, target)
    # this orbax version has no partial_restore: restore untyped (numpy)
    # and select the requested subtrees
    full = _checkpointer().restore(path)
    if isinstance(target, dict):
        return {k: full[k] for k in target}
    return full


def restore_pretrained(state, tx, path: str, torch_loader, logger,
                       what: str = "pretrained"):
    """Torch-vs-orbax dispatch for a ``--pretrained_ckpt``-style path,
    shared by the CLI entry points: a torch checkpoint (a ``.bin`` file, or
    a dir containing ``pytorch_model.bin`` — the HF ``from_pretrained``
    layout the published MedViLL weights use, reference retrieval.py:17-24)
    goes through ``torch_loader(params, batch_stats, file)``; anything else
    is an orbax run dir restored at its latest epoch."""
    from medvill_tpu.core import torch_init

    if torch_init.is_torch_checkpoint(path):
        p = path
        if os.path.isdir(p):
            p = os.path.join(p, "pytorch_model.bin")
        new_params, new_bs = torch_loader(state.params, state.batch_stats, p)
        state = state.replace(params=new_params, batch_stats=new_bs,
                              opt_state=tx.init(new_params))
        logger.info("loaded torch %s checkpoint %s", what, p)
    else:
        epoch = latest_epoch(path)
        if epoch is None:
            # an explicit path that matches neither layout must fail loudly:
            # falling through would silently evaluate/train the random-init
            # model (e.g. a typo'd --load_pretrained_model scoring garbage
            # retrieval metrics as if the published weights were loaded)
            raise FileNotFoundError(
                f"--{what} path {path!r} is neither a torch checkpoint "
                "(.bin/.pth file or dir with pytorch_model.bin) nor an "
                "orbax run dir with numbered epoch subdirs")
        # from_pretrained semantics: WEIGHTS only, fresh optimizer (like
        # the torch branch above).  A full-state restore would also fail
        # structurally whenever the pretrain run's optimizer tree differs
        # from this run's (e.g. pretrain's grad-accum/freeze wrappers vs
        # retrieval's bare AdamW).
        restored = restore(path, epoch,
                           {"params": state.params,
                            "batch_stats": state.batch_stats},
                           partial=True)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=tx.init(restored["params"]))
        logger.info("restored %s weights from checkpoint epoch %s "
                    "(fresh optimizer)", what, epoch)
    return state


def latest_epoch(directory: str) -> Optional[int]:
    """Resume-by-scan: the largest epoch with a complete checkpoint
    (reference: finetune.py:37-47 scans model.*.bin ∩ optim.*.bin)."""
    if not os.path.isdir(directory):
        return None
    epochs = []
    for name in os.listdir(directory):
        if re.fullmatch(r"\d+", name) and os.path.isdir(
                os.path.join(directory, name)):
            epochs.append(int(name))
    return max(epochs) if epochs else None


# ---------------------------------------------------------------------------
# Torch checkpoint import (for parity with reference-pretrained weights).
# ---------------------------------------------------------------------------

def torch_remap(state_dict: Dict[str, Any], mapping: str) -> Dict[str, Any]:
    """Key remaps used when moving weights between reference stages:

    - 'pretrain_to_finetune': strip ``enc.`` and rename ``mlm.`` -> ``cls.``
      (reference: sc/finetune.py:333-339);
    - 'finetune_to_decoder': prefix encoder keys with ``bert.``
      (reference: sc/generation_decode.py:384-388).
    """
    out = {}
    for k, v in state_dict.items():
        if mapping == "pretrain_to_finetune":
            if k.startswith("enc."):
                k = k[len("enc."):]
            elif k.startswith("mlm."):
                k = "cls." + k[len("mlm."):]
        elif mapping == "finetune_to_decoder":
            if not k.startswith(("cls.", "bert.")):
                k = "bert." + k
        out[k] = v
    return out


def load_hf_bert_into_joint(params: dict, hf_state_dict: Dict[str, Any],
                            num_layers: int = 12,
                            enc_key: str = "enc") -> dict:
    """Initialize a CXRBERT/JointEncoder param tree from an HF BERT torch
    state_dict — the TPU equivalent of
    ``BertModel.from_pretrained(args.bert_model)`` feeding the joint encoder
    (reference: models/cxrbert_origin.py:42-73 shares bert.embeddings /
    bert.encoder / bert.pooler).  Returns a new tree; image projection and
    heads keep their existing (random) init like the reference."""
    import copy

    imported = import_hf_bert(hf_state_dict, num_layers=num_layers)
    out = copy.deepcopy(params)
    enc = out[enc_key] if enc_key else out
    target_pos = enc["embeddings"]["position_embeddings"]["embedding"]
    if imported["embeddings"]["position_embeddings"]["embedding"].shape \
            != target_pos.shape:
        imported["embeddings"] = resize_position_embeddings(
            imported["embeddings"], target_pos.shape[0])
    # type_vocab_size can differ (vlp uses 6): reference slot semantics
    imported["embeddings"]["token_type_embeddings"]["embedding"] = \
        expand_token_type_embeddings(
            imported["embeddings"]["token_type_embeddings"]["embedding"],
            enc["embeddings"]["token_type_embeddings"]["embedding"])
    if "qkv" in enc["encoder"]["layer_0"]["self"]:
        # target model runs fused QKV (BertConfig.fused_qkv): fold the
        # torch query/key/value linears into the single [H, 3H] parameter
        imported["encoder"] = fuse_qkv_encoder(imported["encoder"])
    enc["embeddings"] = imported["embeddings"]
    enc["encoder"] = imported["encoder"]
    if "pooler" in imported and "pooler" in enc:
        enc["pooler"] = imported["pooler"]
    return out


def fuse_qkv_encoder(encoder: dict) -> dict:
    """Rewrite each layer's ``self/{query,key,value}`` linears into the
    fused ``self/qkv`` layout (kernels concatenated on the output axis —
    columns [0:H]=q, [H:2H]=k, [2H:3H]=v, matching
    models/bert.py::BertSelfAttention.project)."""
    out = {}
    for name, layer in encoder.items():
        layer = dict(layer)
        s = layer["self"]
        if "qkv" not in s:
            layer["self"] = {"qkv": {
                "kernel": np.concatenate(
                    [np.asarray(s[m]["kernel"])
                     for m in ("query", "key", "value")], axis=1),
                "bias": np.concatenate(
                    [np.asarray(s[m]["bias"])
                     for m in ("query", "key", "value")]),
            }}
        out[name] = layer
    return out


def expand_token_type_embeddings(src, dst) -> "np.ndarray":
    """Resize a token-type embedding table from ``src`` rows onto ``dst``'s
    row count with the REFERENCE's slot semantics
    (sc/pytorch_pretrained_bert/model.py:650-666): common rows copy; when
    growing a 2-type pretrain table to the VLP's >= 6 types, slots 2 (L2R),
    3 (R2L) and 4 (S2S query) take pretrain slot 0 and slot 5 (S2S answer)
    takes pretrain slot 1 — so an s2s finetune starts with the image block
    (type 4) carrying the PRETRAINED image-segment embedding and the text
    block (type 5) the pretrained text-segment embedding, preserving the
    image/text token signatures the transferred encoder weights were
    trained against.  (Leaving the new slots random perturbs every image
    token by the same random vector at recover time, which measurably
    breaks the transferred image->text binding — the overfit proof's
    finetune stage class-collapses without this.)  Rows the reference
    leaves as resize_() garbage (2 < n < 6) keep ``dst``'s init instead."""
    src = np.asarray(src)
    out = np.asarray(dst).copy()
    rows = min(src.shape[0], out.shape[0])
    out[:rows] = src[:rows]
    if out.shape[0] > src.shape[0] and out.shape[0] >= 6 \
            and src.shape[0] >= 2:
        out[2] = src[0]
        out[3] = src[0]
        out[4] = src[0]
        out[5] = src[1]
    return out


def resize_position_embeddings(params: dict, new_size: int) -> dict:
    """Position-embedding resize on checkpoint load: copy min(old, new) rows,
    keep the target init for the remainder (reference trick:
    sc/pytorch_pretrained_bert/model.py:670-687).  ``params`` is an
    embeddings subtree containing position_embeddings/embedding."""
    import copy

    out = copy.deepcopy(params)
    table = np.asarray(out["position_embeddings"]["embedding"])
    old = table.shape[0]
    if old == new_size:
        return out
    new = np.zeros((new_size, table.shape[1]), table.dtype)
    if old > new_size:
        new[:] = table[:new_size]
    else:
        new[:old] = table
        new[old:] = table[-1]  # extend with the last learned row
    out["position_embeddings"]["embedding"] = new
    return out


def import_torchvision_resnet50(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """torchvision resnet50 state_dict -> our ResNet50Trunk
    {params, batch_stats} pytrees.

    Conv: OIHW -> HWIO transpose.  BatchNorm: weight/bias -> scale/bias
    params; running_mean/var -> batch_stats.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def to_np(v):
        return np.asarray(v)

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_kernel(v):
        return to_np(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    stage_sizes = [3, 4, 6, 3]
    # stem
    put(params, ("conv1", "kernel"), conv_kernel(state_dict["conv1.weight"]))
    put(params, ("bn1", "scale"), to_np(state_dict["bn1.weight"]))
    put(params, ("bn1", "bias"), to_np(state_dict["bn1.bias"]))
    put(batch_stats, ("bn1", "mean"), to_np(state_dict["bn1.running_mean"]))
    put(batch_stats, ("bn1", "var"), to_np(state_dict["bn1.running_var"]))
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            src = f"layer{stage + 1}.{block}"
            dst = f"layer{stage + 1}_{block}"
            for ci in (1, 2, 3):
                put(params, (dst, f"conv{ci}", "kernel"),
                    conv_kernel(state_dict[f"{src}.conv{ci}.weight"]))
                put(params, (dst, f"bn{ci}", "scale"),
                    to_np(state_dict[f"{src}.bn{ci}.weight"]))
                put(params, (dst, f"bn{ci}", "bias"),
                    to_np(state_dict[f"{src}.bn{ci}.bias"]))
                put(batch_stats, (dst, f"bn{ci}", "mean"),
                    to_np(state_dict[f"{src}.bn{ci}.running_mean"]))
                put(batch_stats, (dst, f"bn{ci}", "var"),
                    to_np(state_dict[f"{src}.bn{ci}.running_var"]))
            if f"{src}.downsample.0.weight" in state_dict:
                put(params, (dst, "downsample_conv", "kernel"),
                    conv_kernel(state_dict[f"{src}.downsample.0.weight"]))
                put(params, (dst, "downsample_bn", "scale"),
                    to_np(state_dict[f"{src}.downsample.1.weight"]))
                put(params, (dst, "downsample_bn", "bias"),
                    to_np(state_dict[f"{src}.downsample.1.bias"]))
                put(batch_stats, (dst, "downsample_bn", "mean"),
                    to_np(state_dict[f"{src}.downsample.1.running_mean"]))
                put(batch_stats, (dst, "downsample_bn", "var"),
                    to_np(state_dict[f"{src}.downsample.1.running_var"]))
    return {"params": params, "batch_stats": batch_stats}


def import_hf_bert(state_dict: Dict[str, Any], num_layers: int = 12) -> dict:
    """HF ``bert.*`` torch state_dict -> our BertEmbeddings/BertEncoder/
    BertPooler params (under one dict with keys 'embeddings', 'encoder',
    'pooler').  Linear: weight^T -> kernel."""
    def t(v):
        return np.asarray(v)

    def lin(prefix):
        return {"kernel": t(state_dict[prefix + ".weight"]).T,
                "bias": t(state_dict[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": t(state_dict[prefix + ".weight"]),
                "bias": t(state_dict[prefix + ".bias"])}

    p: Dict[str, Any] = {}
    emb = "bert.embeddings" if "bert.embeddings.word_embeddings.weight" in \
        state_dict else "embeddings"
    p["embeddings"] = {
        "word_embeddings": {"embedding":
                            t(state_dict[f"{emb}.word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": t(state_dict[f"{emb}.position_embeddings.weight"])},
        "token_type_embeddings": {
            "embedding": t(state_dict[f"{emb}.token_type_embeddings.weight"])},
        "LayerNorm": ln(f"{emb}.LayerNorm"),
    }
    encp = emb.replace("embeddings", "encoder")
    layers = {}
    for i in range(num_layers):
        lp = f"{encp}.layer.{i}"
        layers[f"layer_{i}"] = {
            "self": {"query": lin(f"{lp}.attention.self.query"),
                     "key": lin(f"{lp}.attention.self.key"),
                     "value": lin(f"{lp}.attention.self.value")},
            "attention_output": {
                "dense": lin(f"{lp}.attention.output.dense"),
                "LayerNorm": ln(f"{lp}.attention.output.LayerNorm")},
            "intermediate": lin(f"{lp}.intermediate.dense"),
            "output_dense": lin(f"{lp}.output.dense"),
            "output_LayerNorm": ln(f"{lp}.output.LayerNorm"),
        }
    p["encoder"] = layers
    poolp = emb.replace("embeddings", "pooler")
    if f"{poolp}.dense.weight" in state_dict:
        p["pooler"] = {"dense": lin(f"{poolp}.dense")}
    return p
