"""MMBT classification: train/eval steps + host trainer loop.

Equivalent of mmbt/main.py:196-340: weighted BCEWithLogits from label
frequencies (main.py:93-104), BertAdam with linear warmup over computed
t_total and no-decay grouping (main.py:107-130), ReduceLROnPlateau on
micro-F1 (main.py:133-136), early stopping via patience (main.py:332-334),
per-epoch eval with AUROC/F1 (main.py:138-193), CSV dump + checkpoint with
best copy (main.py:307-330).

Freeze semantics: the reference sets ``requires_grad`` from flags that are
argparse *strings* and therefore always truthy — i.e. it never actually
freezes (mmbt/main.py:204-209; SURVEY.md §"reference bugs").  We implement
the *intended* behavior: the image encoder is frozen for the first
``freeze_img`` epochs and the text encoder for ``freeze_txt`` epochs, as a
phase-static optax mask (one extra jit specialization per phase change),
with ``freeze_img=freeze_txt=0`` reproducing the reference's actual
behavior.

LR plateau scheduling: optimizer transforms are pure, so the
ReduceLROnPlateau multiplier enters the jitted step as a scalar operand
(``lr_scale``) — no recompile on LR drops.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from medvill_tpu.core.config import ClassificationConfig
from medvill_tpu.eval.metrics import classification_metrics
from medvill_tpu.models.mmbt import MultimodalBertClf
from medvill_tpu.train import optim
from medvill_tpu.train.losses import weighted_bce_with_logits
from medvill_tpu.train.pretrain import TrainState


def build_model(cfg: ClassificationConfig, n_classes: int
                ) -> MultimodalBertClf:
    return MultimodalBertClf(cfg.bert, cfg.image, n_classes)


def freeze_mask(params, freeze_img: bool, freeze_txt: bool):
    """True = trainable.  img_encoder / text encoder subtrees toggled."""
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path in flat:
        trainable = True
        if freeze_img and "img_encoder" in path:
            trainable = False
        if freeze_txt and "encoder" in path and "img_encoder" not in path:
            trainable = False
        out[path] = trainable
    return flax.traverse_util.unflatten_dict(out)


def make_tx(cfg: ClassificationConfig, t_total: int,
            params=None, freeze_img: bool = False, freeze_txt: bool = False
            ) -> optax.GradientTransformation:
    """BertAdam(lr, warmup, t_total) with no-decay grouping; lr itself is
    applied inside the train step (see module docstring), so the chain here
    excludes the final scale."""
    chain = [
        optim.clip_per_tensor_norm(1.0),
        optim.scale_by_adam_no_bias_correction(eps=1e-6),
        optax.masked(optax.add_decayed_weights(0.01), optim.no_decay_mask),
    ]
    tx = optax.chain(*chain)
    if (freeze_img or freeze_txt) and params is not None:
        tx = optim.masked_trainable(
            tx, freeze_mask(params, freeze_img, freeze_txt))
    # accumulate OUTERMOST so clipping/Adam see the averaged k-batch grad,
    # matching reference step-time semantics (mmbt/main.py accum loop)
    return optim.accumulate(tx, cfg.gradient_accumulation_steps)


def make_train_step(model: MultimodalBertClf, tx, cfg: ClassificationConfig,
                    t_total: int, pos_weight: Optional[np.ndarray],
                    cls_id: int, sep_id: int, attention_fn=None,
                    freeze: Tuple[bool, bool] = (False, False)):
    """``freeze=(freeze_img, freeze_txt)`` implements the reference's
    *intended* per-phase freeze (mmbt/main.py:204-209; the reference's own
    flags are truthy strings, see module docstring) without changing the
    optimizer-state structure across phases: frozen subtrees are
    ``stop_gradient``-ed inside the loss (XLA prunes their backward) and
    their final updates are zeroed (so Adam/weight-decay cannot move them).
    Because a leaf's grads are exactly zero while frozen, its Adam moments
    stay exactly zero, matching torch's lazy state init at unfreeze time."""
    pw = jnp.asarray(pos_weight) if pos_weight is not None else None
    freeze_img, freeze_txt = freeze

    def train_step(state: TrainState, batch, rng, lr_scale):
        dropout_rng = jax.random.fold_in(rng, state.step)
        local_attention_fn = attention_fn
        if local_attention_fn is None and cfg.use_flash_attention:
            local_attention_fn = _clf_flash_fn(cfg, batch)
        trainable = (freeze_mask(state.params, freeze_img, freeze_txt)
                     if (freeze_img or freeze_txt) else None)

        def loss_fn(params):
            if trainable is not None:
                params = optim.stop_frozen(params, trainable)
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["input_txt"], batch["txt_len"], batch["segment"],
                batch["image"], cls_id, sep_id, deterministic=False,
                train_cnn=True, attention_fn=local_attention_fn,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            if getattr(cfg, "task_type", "multilabel") == "classification":
                # single-label CE (reference mmbt/main.py:103
                # nn.CrossEntropyLoss)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    out.astype(jnp.float32), batch["label"]).mean()
            elif pw is not None:
                loss = weighted_bce_with_logits(out, batch["label"], pw)
            else:
                loss = weighted_bce_with_logits(out, batch["label"],
                                                jnp.ones(out.shape[-1]))
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # BertAdam warmup_linear lr applied here with the plateau multiplier.
        # The schedule is indexed by OPTIMIZER steps (global_step), not
        # micro-steps — reference advances global_step once per accum window.
        opt_step = state.step // cfg.gradient_accumulation_steps
        x = opt_step.astype(jnp.float32) / t_total
        lr_t = cfg.lr * optim.warmup_linear(x, cfg.warmup) * lr_scale
        updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
        if trainable is not None:
            updates = jax.tree_util.tree_map(
                lambda u, t: u if t else jnp.zeros_like(u),
                updates, trainable)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), loss

    return train_step


def make_multi_train_step(model: MultimodalBertClf, tx,
                          cfg: ClassificationConfig, t_total: int,
                          pos_weight: Optional[np.ndarray], cls_id: int,
                          sep_id: int, k: int, attention_fn=None,
                          freeze: Tuple[bool, bool] = (False, False),
                          reuse_batch: bool = False):
    """``k`` classification micro-steps per jit dispatch (lax.scan over
    [k, B, ...]-stacked batches; see ``optim.scan_micro_steps``).  The
    ``lr_scale`` plateau multiplier is a per-dispatch scalar operand
    forwarded to every micro-step — the reference's ReduceLROnPlateau only
    moves at epoch boundaries (mmbt/main.py:133-136,286), so a constant
    scale within one dispatch is exact."""
    step = make_train_step(model, tx, cfg, t_total, pos_weight, cls_id,
                           sep_id, attention_fn=attention_fn, freeze=freeze)
    return optim.scan_micro_steps(step, k, reuse_batch=reuse_batch)


def make_eval_step(model: MultimodalBertClf, cls_id: int, sep_id: int,
                   attention_fn=None, cfg: "ClassificationConfig" = None):
    def eval_step(state: TrainState, batch):
        local_attention_fn = attention_fn
        if (local_attention_fn is None and cfg is not None
                and cfg.use_flash_attention):
            local_attention_fn = _clf_flash_fn(cfg, batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input_txt"], batch["txt_len"], batch["segment"],
            batch["image"], cls_id, sep_id, deterministic=True,
            attention_fn=local_attention_fn)
        return out

    return eval_step


def _clf_flash_fn(cfg: ClassificationConfig, batch):
    """FULL-mask flash attention for the MMBT layout: spec rebuilt from
    txt_len exactly as MultimodalBertEncoder does internally."""
    from medvill_tpu.core.config import MaskVariant
    from medvill_tpu.ops.flash_attention import (FAMILY_PRETRAIN,
                                                 make_attention_fn)

    txt_len = batch["txt_len"]
    spec = jnp.stack(
        [jnp.full_like(txt_len, int(MaskVariant.FULL)), txt_len], axis=-1)
    return make_attention_fn(
        spec, cfg.image.num_image_embeds + 2, family=FAMILY_PRETRAIN,
        dropout_rate=cfg.bert.attention_probs_dropout_prob)


class PlateauScheduler:
    """ReduceLROnPlateau('max', factor, patience) (reference:
    mmbt/main.py:133-136; torch semantics: decay when no improvement for
    `patience` consecutive epochs)."""

    def __init__(self, factor: float, patience: int, min_scale: float = 1e-8):
        self.factor = factor
        self.patience = patience
        self.scale = 1.0
        self.best = -np.inf
        self.bad = 0
        self.min_scale = min_scale

    def step(self, metric: float) -> float:
        if metric > self.best:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad = 0
        return self.scale


def evaluate(eval_step, state, batches, task_type: str = "multilabel"
             ) -> Tuple[dict, np.ndarray, np.ndarray]:
    """Collect logits over a loader; multilabel computes AUROC/F1,
    classification computes argmax accuracy
    (reference: mmbt/main.py:138-193)."""
    logits, labels = [], []
    for batch in batches:
        out = eval_step(state, jax.tree_util.tree_map(jnp.asarray, batch))
        logits.append(np.asarray(out))
        labels.append(np.asarray(batch["label"]))
    logits = np.concatenate(logits)
    labels = np.concatenate(labels)
    if task_type == "classification":
        # reference mmbt/main.py:151-152,189-191: softmax argmax vs target
        preds = logits.argmax(-1)
        return {"acc": float((preds == labels).mean())}, logits, labels
    return classification_metrics(logits, labels), logits, labels
