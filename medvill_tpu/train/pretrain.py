"""Pretraining: one pjit-compiled train step (MLM + ITM).

Equivalent of ``CXRBERT_Trainer`` (reference: models/train_origin.py): loss =
CE(mlm, ignore -100) + CE(itm), AdamW, per-step MLM/ITM accuracy bookkeeping
(reference: train_origin.py:108-146) — computed on device instead of host
numpy.

TPU design: ``train_step(state, batch, rng) -> (state, metrics)`` is jit'd
once over a 1-D data mesh (batch sharded on axis 0, params replicated); XLA
inserts the gradient all-reduce over ICI.  The reference's nn.DataParallel
scatter/gather (train_origin.py:53-55) has no equivalent code here — the
compiler owns communication.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from medvill_tpu.core.config import PretrainConfig
from medvill_tpu.models.cxrbert import CXRBERT
from medvill_tpu.train import optim


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def all_params(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def build_model(cfg: PretrainConfig) -> CXRBERT:
    return CXRBERT(cfg.bert, cfg.image, img_position=cfg.img_position)


def init_state(cfg: PretrainConfig, rng: jax.Array,
               tx: Optional[optax.GradientTransformation] = None
               ) -> Tuple[CXRBERT, TrainState]:
    model = build_model(cfg)
    B = 2
    L_txt = cfg.seq_len + 1
    N = cfg.image.num_image_embeds
    dummy = dict(
        cls_tok=jnp.zeros((B, 1), jnp.int32),
        input_txt=jnp.zeros((B, L_txt), jnp.int32),
        mask_spec=jnp.zeros((B, 2), jnp.int32),
        segment=jnp.ones((B, L_txt), jnp.int32),
        # the model input is always 3-channel: img_channel=1 sources are
        # grayscale-expanded at load time (reference
        # full_dset_retrieval.py:174-176 Grayscale(num_output_channels=3)),
        # matching the 3-channel ResNet-50 stem
        image=jnp.zeros((B, cfg.image.img_size, cfg.image.img_size, 3),
                        jnp.float32),
        sep_tok=jnp.zeros((B, 1), jnp.int32),
    )
    pixel_indices = jnp.arange(N, dtype=jnp.int32)
    variables = model.init(
        {"params": rng}, dummy["cls_tok"], dummy["input_txt"],
        dummy["mask_spec"], dummy["segment"], dummy["image"],
        dummy["sep_tok"], pixel_indices=pixel_indices, deterministic=True,
        disturbing=cfg.disturbing_mask)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tx is None:
        tx = optim.adamw(cfg.lr, cfg.beta1, cfg.beta2, cfg.eps,
                         cfg.weight_decay)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    return model, state


def sample_pixel_indices(rng: jax.Array, num_fibers: int,
                         num_image_embeds: int) -> jnp.ndarray:
    """Random-pixel sampling: sorted randperm(M)[:N], one draw per step
    shared across the batch (reference: models/image.py:63-68)."""
    perm = jax.random.permutation(rng, num_fibers)[:num_image_embeds]
    return jnp.sort(perm).astype(jnp.int32)


def _chunked_mlm_loss(model: CXRBERT, params, txt_hidden, txt_labels,
                      chunk: int = 128):
    """Exact CE(ignore=-100, mean over valid) computed in position chunks.

    Each chunk's [B, C, V] logits live only inside a jax.checkpoint region,
    so forward keeps one chunk's logits and backward recomputes per chunk.
    Semantics identical to torch CrossEntropyLoss over the full logits
    (reference: models/train_origin.py:62,108-126).
    """
    B, T, H = txt_hidden.shape
    pad = (-T) % chunk
    if pad:
        txt_hidden = jnp.pad(txt_hidden, ((0, 0), (0, pad), (0, 0)))
        txt_labels = jnp.pad(txt_labels, ((0, 0), (0, pad)),
                             constant_values=-100)
    n_chunks = txt_hidden.shape[1] // chunk
    h = txt_hidden.reshape(B, n_chunks, chunk, H).transpose(1, 0, 2, 3)
    l = txt_labels.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_stats(h_c, l_c):
        logits = model.apply({"params": params}, h_c,
                             method=CXRBERT.mlm_chunk).astype(jnp.float32)
        valid = l_c != -100
        safe = jnp.where(valid, l_c, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, logz - gold, 0.0).sum()
        correct = ((jnp.argmax(logits, -1) == l_c) & valid).sum()
        return nll, correct, valid.sum()

    def body(carry, xs):
        h_c, l_c = xs
        nll, correct, n = chunk_stats(h_c, l_c)
        return (carry[0] + nll, carry[1] + correct, carry[2] + n), None

    (nll, correct, n), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0), jnp.int32(0)), (h, l))
    return nll / jnp.maximum(n, 1), correct, n


def _gathered_mlm_loss(model: CXRBERT, params, txt_hidden, txt_labels,
                       bound: int):
    """Exact CE(ignore=-100, mean over valid) over only the labeled
    positions.

    The reference computes full [B, L, V] logits and lets ignore_index drop
    the ~85% unlabeled positions (train_origin.py:62,108-126).  Math is
    identical if we first gather the labeled positions: per-token masking at
    p=0.15 over <=253 tokens gives ~38 labels (Binomial std 5.7), so a
    static bound of 96 is +10 sigma — overflow probability ~1e-17 per
    sample; any overflowing labels beyond the bound would be dropped.
    This replaces the position-chunked scan (the [B, chunk, V] f32 logits
    passes cost ~17 ms/step at the reference config) with one small
    [B, bound, V] projection."""
    valid = txt_labels != -100
    # stable order: labeled positions first, original order preserved
    order = jnp.argsort(jnp.where(valid, 0, 1), axis=1, stable=True)
    idx = order[:, :bound]
    g_h = jnp.take_along_axis(txt_hidden, idx[..., None], axis=1)
    g_l = jnp.take_along_axis(txt_labels, idx, axis=1)
    logits = model.apply({"params": params}, g_h,
                         method=CXRBERT.mlm_chunk).astype(jnp.float32)
    valid_g = g_l != -100
    safe = jnp.where(valid_g, g_l, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid_g, logz - gold, 0.0).sum()
    correct = ((jnp.argmax(logits, -1) == g_l) & valid_g).sum()
    n = valid_g.sum()
    return nll / jnp.maximum(n, 1), correct, n


def pretrain_loss_and_metrics(model: CXRBERT, params, batch_stats, batch,
                              dropout_rng, pixel_indices, cfg: PretrainConfig,
                              train: bool, attention_fn=None):
    if attention_fn is None and cfg.use_flash_attention:
        from medvill_tpu.ops.flash_attention import (FAMILY_PRETRAIN,
                                                     make_attention_fn)

        attention_fn = make_attention_fn(
            batch["mask_spec"], cfg.image.num_image_embeds + 2,
            family=FAMILY_PRETRAIN,
            dropout_rate=cfg.bert.attention_probs_dropout_prob)
    variables = {"params": params, "batch_stats": batch_stats}
    mutable = ["batch_stats"] if train else False
    outs = model.apply(
        variables, batch["cls_tok"], batch["input_txt"], batch["mask_spec"],
        batch["segment"], batch["image"], batch["sep_tok"],
        pixel_indices=pixel_indices, deterministic=not train,
        train_cnn=train, disturbing=cfg.disturbing_mask,
        attention_fn=attention_fn,
        rngs={"dropout": dropout_rng} if train else {},
        mutable=mutable, method=CXRBERT.features)
    if train:
        (sequence, pooled), updates = outs
        new_batch_stats = updates.get("batch_stats", batch_stats)
    else:
        sequence, pooled = outs
        new_batch_stats = batch_stats
    itm_logits = model.apply({"params": params}, pooled,
                             method=CXRBERT.itm_logits)

    metrics: Dict[str, jnp.ndarray] = {}
    total = 0.0
    if cfg.mlm_task:
        # chunked MLM loss: image positions carry no labels (all -100;
        # data/pretrain.py txt_labels_i), so only text positions are
        # projected, in checkpointed chunks — the full [B, L, V] logit
        # tensor (1.8 GB at the reference config) never exists.
        I2 = cfg.image.num_image_embeds + 2
        txt_hidden = sequence[:, I2:]
        txt_labels = batch["txt_labels"][:, I2:]
        bound = getattr(cfg, "mlm_gather_bound", 0)
        if bound and bound < txt_hidden.shape[1]:
            mlm_loss, correct, n_valid = _gathered_mlm_loss(
                model, params, txt_hidden, txt_labels, bound)
        else:
            mlm_loss, correct, n_valid = _chunked_mlm_loss(
                model, params, txt_hidden, txt_labels,
                chunk=cfg.mlm_loss_chunk)
        total = total + mlm_loss
        metrics["mlm_loss"] = mlm_loss
        metrics["mlm_correct"] = correct
        metrics["mlm_total"] = n_valid
    if cfg.itm_task:
        itm_labels = batch["is_aligned"].astype(jnp.int32)
        logz = jax.nn.logsumexp(itm_logits.astype(jnp.float32), axis=-1)
        gold = jnp.take_along_axis(itm_logits.astype(jnp.float32),
                                   itm_labels[:, None], axis=-1)[:, 0]
        itm_loss = (logz - gold).mean()
        total = total + itm_loss
        metrics["itm_loss"] = itm_loss
        metrics["itm_correct"] = (
            jnp.argmax(itm_logits, -1) == itm_labels).sum()
        metrics["itm_total"] = jnp.asarray(itm_labels.shape[0], jnp.int32)
    metrics["loss"] = total
    return total, (metrics, new_batch_stats)


def make_train_step(model: CXRBERT, tx: optax.GradientTransformation,
                    cfg: PretrainConfig, attention_fn=None):
    """Returns jit-able (state, batch, rng) -> (state, metrics)."""

    num_fibers = cfg.image.num_fibers
    freeze = cfg.image.freeze_prefix_stages and cfg.image.encoder != "ViT"

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        pix_rng, dropout_rng = jax.random.split(step_rng)
        if cfg.image.encoder == "random-pixel":
            pixel_indices = sample_pixel_indices(
                pix_rng, num_fibers, cfg.image.num_image_embeds)
        else:
            pixel_indices = None

        def loss_fn(params):
            if freeze:
                # stop-grad the frozen CNN trunk (cxrbert_origin.py:65-70
                # — the children()[5:] unfreeze is a no-op, so the WHOLE
                # trunk is frozen): XLA then DCEs the entire conv backward
                from medvill_tpu.models.resnet import cnn_freeze_mask
                params = optim.stop_frozen(
                    params, cnn_freeze_mask(
                        params, ("enc", "img_encoder")))
            return pretrain_loss_and_metrics(
                model, params, state.batch_stats, batch, dropout_rng,
                pixel_indices, cfg, train=True, attention_fn=attention_fn)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    return train_step


def make_multi_train_step(model: CXRBERT, tx: optax.GradientTransformation,
                          cfg: PretrainConfig, k: int, attention_fn=None,
                          reuse_batch: bool = False):
    """``k`` train micro-steps inside ONE jit dispatch.

    Per-dispatch host/runtime overhead (Python dispatch, transfer-guard
    checks, and on a remote-tunnel runtime the per-launch RPC) was measured
    at ~25% of wall step time at the reference config (trace ~160 ms device
    vs ~218 ms wall); a ``lax.scan`` over micro-steps amortizes it 1/k.
    The reference has no equivalent — each ``loss.backward()`` is its own
    launch (models/train_origin.py:96-107).

    - default: ``batch`` leaves carry a leading micro-step dim ``[k, B,
      ...]`` (see ``mesh.shard_stacked_batch``); scan feeds one micro-batch
      per iteration.  Composes with ``optim.accumulate`` (MultiSteps state
      advances inside the scan), so grad-accum costs no extra dispatches.
    - ``reuse_batch=True``: one ``[B, ...]`` batch reused for every
      micro-step (synthetic-data benches only).

    Returns ``(state, metrics)`` with metrics stacked ``[k, ...]`` — callers
    log per-micro-step or take ``[-1]``.
    """
    step = make_train_step(model, tx, cfg, attention_fn=attention_fn)
    return optim.scan_micro_steps(step, k, reuse_batch=reuse_batch)


def make_eval_step(model: CXRBERT, cfg: PretrainConfig, attention_fn=None):
    def eval_step(state: TrainState, batch):
        if cfg.image.encoder == "random-pixel":
            # eval uses the same random-sampling path; fix a deterministic
            # permutation per eval (reference keeps sampling randomly —
            # train_origin.py:171-252 uses the same model forward)
            pixel_indices = sample_pixel_indices(
                jax.random.PRNGKey(0), cfg.image.num_fibers,
                cfg.image.num_image_embeds)
        else:
            pixel_indices = None
        _, (metrics, _) = pretrain_loss_and_metrics(
            model, state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), pixel_indices, cfg, train=False,
            attention_fn=attention_fn)
        return metrics

    return eval_step
