"""Report-generation / VQA finetune train step.

Equivalent of sc/finetune.py's train loop over
``BertForPreTrainingLossMask.forward`` (reference: model.py:968-1054 and
finetune.py:421-470):

- report-gen: gather masked positions -> tied MLM head -> CE or
  label-smoothing (reduction none) -> masked-weight normalization with
  Ruotian-Luo drop-worst (model.py:986-1010);
- VQA: BCEWithLogits over the 458-way soft target plus the batch score
  bookkeeping (model.py:1016-1041);
- BertAdam with manual ``warmup_linear`` lr stepping over t_total
  (finetune.py:391-395,461-470).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medvill_tpu.core.config import FinetuneConfig
from medvill_tpu.data.masks import seq2seq_spec_dense
from medvill_tpu.models.seq2seq import VLPForPreTraining
from medvill_tpu.train import optim
from medvill_tpu.train.losses import (bce_with_logits,
                                      cross_entropy_per_example,
                                      drop_worst_normalize,
                                      label_smoothing_loss)
from medvill_tpu.train.pretrain import TrainState


def build_model(cfg: FinetuneConfig) -> VLPForPreTraining:
    return VLPForPreTraining(cfg.bert, cfg.image,
                             len_vis_input=cfg.len_vis_input, task=cfg.task,
                             n_answers=cfg.vqa_num_answers)


def finetune_bias(mask_spec: jnp.ndarray, len_vis_input: int, max_len: int,
                  dtype=jnp.float32) -> jnp.ndarray:
    dense = seq2seq_spec_dense(mask_spec[:, 0], mask_spec[:, 1],
                               len_vis_input, max_len)
    return ((1.0 - dense.astype(dtype)) * -10000.0)[:, None, :, :]


def drop_worst_ratio_for_epoch(cfg: FinetuneConfig, epoch0: int) -> float:
    """Epoch-gated drop-worst ratio (reference finetune.py:440:
    ``args.max_drop_worst_ratio if i_epoch > args.drop_after else 0`` with
    1-based i_epoch; ``epoch0`` here is 0-based)."""
    active = (epoch0 + 1) > getattr(cfg, "drop_after", 6)
    return getattr(cfg, "max_drop_worst_ratio", 0.0) if active else 0.0


def make_train_step(model: VLPForPreTraining, tx, cfg: FinetuneConfig,
                    t_total: int, attention_fn=None,
                    drop_worst_ratio: float = 0.0):
    """``drop_worst_ratio`` is epoch-gated by the caller (reference
    finetune.py:440: max_drop_worst_ratio if i_epoch > drop_after else 0) —
    it is a static compile-time ratio, so the CLI builds one jitted step per
    phase (at most two)."""
    lr_schedule = optim.SCHEDULES[getattr(cfg, "sche_mode", "warmup_linear")]

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        local_attention_fn = attention_fn
        if local_attention_fn is None and cfg.use_flash_attention:
            from medvill_tpu.ops.flash_attention import (FAMILY_SEQ2SEQ,
                                                         make_attention_fn)

            local_attention_fn = make_attention_fn(
                batch["mask_spec"], cfg.len_vis_input + 2,
                family=FAMILY_SEQ2SEQ,
                dropout_rate=cfg.bert.attention_probs_dropout_prob)
        bias = (None if local_attention_fn is not None else
                finetune_bias(batch["mask_spec"], cfg.len_vis_input,
                              cfg.max_seq_length))

        def loss_fn(params):
            if cfg.image.freeze_prefix_stages:
                # reference's unconditional whole-trunk CNN freeze
                # (model.py:910-924 — no-op unfreeze): stop-grad so XLA DCEs
                # their backward entirely
                from medvill_tpu.models.resnet import cnn_freeze_mask
                params = optim.stop_frozen(
                    params, cnn_freeze_mask(
                        params, ("bert", "img_encoder")))
            variables = {"params": params, "batch_stats": state.batch_stats}
            if cfg.task == "vqa":
                logits, updates = model.apply(
                    variables, batch["image"], batch["input_ids"],
                    batch["segment_ids"], bias, deterministic=False,
                    train_cnn=True, attention_fn=local_attention_fn,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
                loss = bce_with_logits(logits, batch["ans_target"])
                score = jnp.take_along_axis(
                    batch["ans_target"],
                    jnp.argmax(logits, -1)[:, None], axis=1)[:, 0]
                aux = {"vqa_loss": loss, "batch_score": score.sum(),
                       "n": jnp.asarray(logits.shape[0])}
            else:
                logits, updates = model.apply(
                    variables, batch["image"], batch["input_ids"],
                    batch["segment_ids"], bias,
                    masked_pos=batch["masked_pos"], deterministic=False,
                    train_cnn=True, attention_fn=local_attention_fn,
                    task_idx=batch.get("task_idx"),
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
                if cfg.label_smoothing > 0:
                    per_pos = label_smoothing_loss(
                        logits, batch["masked_ids"], cfg.label_smoothing,
                        cfg.bert.vocab_size, ignore_index=0)
                else:
                    per_pos = cross_entropy_per_example(logits,
                                                        batch["masked_ids"])
                loss = drop_worst_normalize(per_pos, batch["masked_weights"],
                                            drop_worst_ratio)
                aux = {"masked_lm_loss": loss}
            aux["loss"] = loss
            return loss, (aux, updates.get("batch_stats", state.batch_stats))

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # manual warmup_linear lr (finetune.py:461-470); schedule indexed by
        # optimizer steps — reference bumps global_step every accum window
        opt_step = state.step // cfg.gradient_accumulation_steps
        x = opt_step.astype(jnp.float32) / t_total
        lr_t = cfg.lr * lr_schedule(x, cfg.warmup)
        updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), aux

    return train_step


def make_multi_train_step(model: VLPForPreTraining, tx, cfg: FinetuneConfig,
                          t_total: int, k: int, attention_fn=None,
                          drop_worst_ratio: float = 0.0,
                          reuse_batch: bool = False):
    """``k`` finetune micro-steps inside ONE jit dispatch (lax.scan over
    [k, B, ...]-stacked batches, same design as
    train.pretrain.make_multi_train_step — per-dispatch host/RPC overhead
    amortizes 1/k).  Dropout streams diverge per micro-step because the
    inner step folds ``state.step`` into the rng.  ``reuse_batch=True``
    scans one [B, ...] batch k times (synthetic benches only)."""
    step = make_train_step(model, tx, cfg, t_total,
                           attention_fn=attention_fn,
                           drop_worst_ratio=drop_worst_ratio)
    return optim.scan_micro_steps(step, k, reuse_batch=reuse_batch)


def make_vqa_eval_step(model: VLPForPreTraining, cfg: FinetuneConfig,
                       attention_fn=None):
    """VQA inference: classifier over h[:,0] * h[:,len_vis+1]
    (reference: model.py:979-984 vqa_inference)."""

    def eval_step(state: TrainState, batch):
        bias = finetune_bias(batch["mask_spec"], cfg.len_vis_input,
                             cfg.max_seq_length)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], batch["input_ids"], batch["segment_ids"], bias,
            deterministic=True, attention_fn=attention_fn,
            vqa_inference=True)
        return logits

    return eval_step


def vqa_evaluate(eval_step, state, batches) -> Dict[str, float]:
    """Soft-score accuracy split into open/closed
    (reference: model.py:1021-1041 open/closed bookkeeping)."""
    import numpy as np

    scores, types = [], []
    for batch in batches:
        use = {k: jnp.asarray(v) for k, v in batch.items()
               if k in ("image", "input_ids", "segment_ids", "mask_spec")}
        logits = np.asarray(eval_step(state, use))
        idx = logits.argmax(-1)
        s = np.asarray(batch["ans_target"])[np.arange(len(idx)), idx]
        scores.append(s)
        types.append(np.asarray(batch["ans_type"]))
    scores = np.concatenate(scores)
    types = np.concatenate(types)
    out = {"vqa_acc": float(scores.mean())}
    closed = scores[types == 0]
    opened = scores[types == 1]
    out["closed_acc"] = float(closed.mean()) if len(closed) else float("nan")
    out["open_acc"] = float(opened.mean()) if len(opened) else float("nan")
    out["n_closed"] = int(len(closed))
    out["n_open"] = int(len(opened))
    return out


def make_finetune_tx(cfg: FinetuneConfig) -> optax.GradientTransformation:
    """BertAdam core without the lr scale (applied in-step); no-decay
    grouping per finetune.py:383-390."""
    tx = optax.chain(
        optim.clip_per_tensor_norm(1.0),
        optim.scale_by_adam_no_bias_correction(eps=1e-6),
        optax.masked(optax.add_decayed_weights(cfg.weight_decay),
                     optim.no_decay_mask),
    )
    return optim.accumulate(tx, cfg.gradient_accumulation_steps)
