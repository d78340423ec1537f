"""Retrieval: train/test steps + evaluation.

Equivalent of full_dset_retrieval.py train/test/evaluate
(full_dset_retrieval.py:341-510): training concatenates pos+neg along batch
and minimizes CE over the 2-class ITM head; test collects
``softmax[:, 1]`` alignment scores over candidate pools; metrics in
medvill_tpu/eval/metrics.py.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medvill_tpu.core.config import RetrievalConfig
from medvill_tpu.eval.metrics import evaluate_retrieval
from medvill_tpu.models.cxrbert import CXRBERT
from medvill_tpu.train.pretrain import TrainState, sample_pixel_indices


def build_model(cfg: RetrievalConfig) -> CXRBERT:
    return CXRBERT(cfg.bert, cfg.image)


def make_train_step(model: CXRBERT, tx, cfg: RetrievalConfig,
                    attention_fn=None):
    num_fibers = cfg.image.num_fibers

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        pix_rng, dropout_rng = jax.random.split(step_rng)
        pixel_indices = (sample_pixel_indices(pix_rng, num_fibers,
                                              cfg.image.num_image_embeds)
                         if cfg.image.encoder == "random-pixel" else None)
        local_attention_fn = attention_fn
        if local_attention_fn is None and cfg.use_flash_attention:
            from medvill_tpu.ops.flash_attention import (FAMILY_PRETRAIN,
                                                         make_attention_fn)

            local_attention_fn = make_attention_fn(
                batch["mask_spec"], cfg.image.num_image_embeds + 2,
                family=FAMILY_PRETRAIN,
                dropout_rate=cfg.bert.attention_probs_dropout_prob)

        def loss_fn(params):
            if cfg.image.freeze_prefix_stages and cfg.image.encoder != "ViT":
                # unconditional whole-trunk CNN freeze inherited from the CXRBERT
                # constructor (cxrbert_origin.py:66-70)
                from medvill_tpu.models.resnet import cnn_freeze_mask
                from medvill_tpu.train import optim as optim_lib
                params = optim_lib.stop_frozen(
                    params, cnn_freeze_mask(
                        params, ("enc", "img_encoder")))
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["cls_tok"], batch["input_txt"], batch["mask_spec"],
                batch["segment"], batch["image"], batch["sep_tok"],
                pixel_indices=pixel_indices, deterministic=False,
                train_cnn=True, attention_fn=local_attention_fn,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
                method=CXRBERT.itm_forward)
            labels = batch["is_aligned"].astype(jnp.int32)
            logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
            gold = jnp.take_along_axis(logits.astype(jnp.float32),
                                       labels[:, None], axis=-1)[:, 0]
            loss = (logz - gold).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (acc, updates.get("batch_stats", state.batch_stats))

        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def make_score_step(model: CXRBERT, cfg: RetrievalConfig, attention_fn=None):
    """Alignment score = softmax(logits)[:, 1]
    (full_dset_retrieval.py:461-510)."""

    def score_step(state: TrainState, batch):
        pixel_indices = (sample_pixel_indices(
            jax.random.PRNGKey(0), cfg.image.num_fibers,
            cfg.image.num_image_embeds)
            if cfg.image.encoder == "random-pixel" else None)
        local_attention_fn = attention_fn
        if local_attention_fn is None and cfg.use_flash_attention:
            from medvill_tpu.ops.flash_attention import (FAMILY_PRETRAIN,
                                                         make_attention_fn)

            local_attention_fn = make_attention_fn(
                batch["mask_spec"], cfg.image.num_image_embeds + 2,
                family=FAMILY_PRETRAIN)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["cls_tok"], batch["input_txt"], batch["mask_spec"],
            batch["segment"], batch["image"], batch["sep_tok"],
            pixel_indices=pixel_indices, deterministic=True,
            attention_fn=local_attention_fn, method=CXRBERT.itm_forward)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]

    return score_step


def make_cnn_train_step(model, tx, cfg: RetrievalConfig):
    """Late-fusion CNN_BERT branch (reference: full_dset_retrieval.py:38,
    549-555 with CNN_BERT/main_cnn_bert.py model): CE over 2-class
    alignment logits on pos+neg concatenated batches."""

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["input_txt"], batch["attn_len"], batch["segment"],
                batch["image"], deterministic=False, train_cnn=True,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            labels = batch["is_aligned"].astype(jnp.int32)
            logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
            gold = jnp.take_along_axis(logits.astype(jnp.float32),
                                       labels[:, None], axis=-1)[:, 0]
            loss = (logz - gold).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (acc, updates.get("batch_stats", state.batch_stats))

        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), \
            {"loss": loss, "acc": acc}

    return train_step


def make_cnn_score_step(model, cfg: RetrievalConfig):
    def score_step(state: TrainState, batch):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input_txt"], batch["attn_len"], batch["segment"],
            batch["image"], deterministic=True)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]

    return score_step


def run_retrieval_eval(score_step, state, batches, eval_len_size: int,
                       direction: str = "i2t",
                       rank_dump_path: Optional[str] = None,
                       records: Optional[list] = None):
    """Collect scores + is_aligned over the pool, reshape to
    [n_queries, pool], evaluate (full_dset_retrieval.py:577-643).  With
    ``rank_dump_path`` also writes the per-query rank dump the reference
    appends to rank_result_at_eval.json: one JSON line
    ``{"Rank": rank, "Result": <dataset record>}`` per aligned example
    (full_dset_retrieval.py:419-429,591-613; the reference writes each line
    twice by accident — we write once).  ``records`` is the dataset's raw
    record list used to resolve Result; without it the line carries the
    candidate index instead."""
    from medvill_tpu.eval.metrics import compute_ranks

    scores, labels, indices = [], [], []
    for batch in batches:
        s = score_step(state, jax.tree_util.tree_map(jnp.asarray, batch))
        scores.append(np.asarray(s))
        labels.append(np.asarray(batch["is_aligned"]))
        if "index" in batch:
            indices.append(np.asarray(batch["index"]))
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    n = (len(scores) // eval_len_size) * eval_len_size
    if n != len(scores):
        # the eval loaders run drop_last=False so every candidate arrives;
        # a remainder here means the dataset itself isn't a whole number of
        # query pools — surface it instead of silently dropping a query
        import warnings

        warnings.warn(
            f"retrieval eval: {len(scores) - n} trailing candidates do not "
            f"fill an eval_len_size={eval_len_size} pool and are excluded")
    sim = scores[:n].reshape(-1, eval_len_size)
    lab = labels[:n].reshape(-1, eval_len_size)
    hits, mrr, rp = evaluate_retrieval(sim, lab, direction)
    out = {"hits": hits, "mrr": mrr, **rp}
    if rank_dump_path and indices:
        import json

        idx = np.concatenate(indices)[:n].reshape(-1, eval_len_size)
        _, aligned_lst = compute_ranks(sim, lab, idx)
        with open(rank_dump_path, "a", encoding="utf-8") as f:
            for cand_idx, rank in aligned_lst:
                result = (records[cand_idx] if records is not None
                          else cand_idx)
                f.write(json.dumps({"Rank": rank, "Result": result},
                                   ensure_ascii=False) + "\n")
        out["rank_dump"] = rank_dump_path
    return out
