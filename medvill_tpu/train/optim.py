"""Optimizers and LR schedules as optax transforms.

- `adamw`: HF AdamW as used by the pretrain trainer — betas (0.9, 0.999),
  eps 1e-6, weight decay 0 (reference: models/train_origin.py:60; HF v3
  defaults).
- `bert_adam`: the vendored BertAdam — Adam *without* bias correction,
  decoupled weight decay, per-parameter-tensor grad-norm clipping at 1.0, and
  a per-step warmup schedule (reference:
  sc/pytorch_pretrained_bert/optimization.py:33-182).  Schedules:
  warmup_linear / warmup_constant / warmup_cosine
  (optimization.py:32-44 — note warmup_linear decays as
  ``max((x-1)/(warmup-1), 0)``).
- `noam`: the unused-but-present ScheduledOptim wrapper
  (reference: models/optim_schedule.py:5-41).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_linear(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


def warmup_constant(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_cosine(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup,
                     0.5 * (1.0 + jnp.cos(jnp.pi * x)))


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_constant": warmup_constant,
    "warmup_cosine": warmup_cosine,
}


def adamw(lr: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
          weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)


def clip_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """BertAdam clips each parameter tensor's grad norm independently
    (reference: optimization.py:146-148, clip_grad_norm_(p, max_norm))."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
            return (g * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_adam_no_bias_correction(b1: float = 0.9, b2: float = 0.999,
                                     eps: float = 1e-6):
    """m/(sqrt(v)+eps) with no bias correction (optimization.py:155-158)."""

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, updates)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, updates)
        upd = jax.tree_util.tree_map(lambda m, v: m / (jnp.sqrt(v) + eps),
                                     mu, nu)
        return upd, optax.ScaleByAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def no_decay_mask(params) -> dict:
    """Reference param grouping: no weight decay for bias / LayerNorm
    weights (reference: sc/finetune.py:383-390, mmbt/main.py:110-120).
    Returns True where decay applies."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path in flat:
        last = path[-1]
        is_no_decay = (last == "bias") or any(
            "LayerNorm" in p or p == "ln" for p in path) or (
            last in ("scale",))  # flax LayerNorm scale == torch LN weight
        out[path] = not is_no_decay
    return flax.traverse_util.unflatten_dict(out)


def bert_adam(lr: float, warmup: float = -1.0, t_total: int = -1,
              schedule: str = "warmup_linear", b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-6,
              weight_decay: float = 0.01, max_grad_norm: float = 1.0,
              decay_mask_fn: Optional[Callable] = None
              ) -> optax.GradientTransformation:
    """The vendored BertAdam as a single optax chain."""

    chain = []
    if max_grad_norm > 0:
        chain.append(clip_per_tensor_norm(max_grad_norm))
    chain.append(scale_by_adam_no_bias_correction(b1, b2, eps))
    if weight_decay > 0:
        if decay_mask_fn is not None:
            chain.append(optax.masked(
                optax.add_decayed_weights(weight_decay), decay_mask_fn))
        else:
            chain.append(optax.add_decayed_weights(weight_decay))

    if t_total != -1:
        sched = SCHEDULES[schedule]

        def lr_fn(count):
            x = count.astype(jnp.float32) / t_total
            return lr * sched(x, warmup if warmup != -1 else 0.002)

        chain.append(optax.scale_by_schedule(lambda c: -lr_fn(c)))
    else:
        chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def decay_to_init(weight_decay: float, init_params,
                  decay_mask=None) -> optax.GradientTransformation:
    """BertAdamFineTune's decay-to-initial-weights: the weight-decay term
    pulls toward the *pretrained* weights instead of zero —
    ``update += wd * (p - p_init)`` (reference:
    sc/pytorch_pretrained_bert/optimization.py:185-270; params whose init
    was missing from the recovered checkpoint decay toward zero, matching
    its zeroed init_p for missing keys).

    ``init_params`` pytree must match the trainable params; pass zeros
    leaves (or use ``decay_mask``) for plain decay on selected subtrees.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("decay_to_init requires params")

        def upd(u, p, p0):
            return u + weight_decay * (p - p0)

        if decay_mask is not None:
            new = jax.tree_util.tree_map(
                lambda u, p, p0, m: upd(u, p, p0) if m else u,
                updates, params, init_params, decay_mask)
        else:
            new = jax.tree_util.tree_map(upd, updates, params, init_params)
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


def bert_adam_finetune(lr: float, init_params, warmup: float = -1.0,
                       t_total: int = -1, schedule: str = "warmup_linear",
                       b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
                       weight_decay: float = 0.01,
                       max_grad_norm: float = 1.0,
                       decay_mask_fn: Optional[Callable] = None
                       ) -> optax.GradientTransformation:
    """BertAdam with decay-to-initial-weights (BertAdamFineTune)."""
    chain = []
    if max_grad_norm > 0:
        chain.append(clip_per_tensor_norm(max_grad_norm))
    chain.append(scale_by_adam_no_bias_correction(b1, b2, eps))
    if weight_decay > 0:
        mask = decay_mask_fn(init_params) if decay_mask_fn else None
        chain.append(decay_to_init(weight_decay, init_params, mask))
    if t_total != -1:
        sched = SCHEDULES[schedule]

        def lr_fn(count):
            x = count.astype(jnp.float32) / t_total
            return lr * sched(x, warmup if warmup != -1 else 0.002)

        chain.append(optax.scale_by_schedule(lambda c: -lr_fn(c)))
    else:
        chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def noam_schedule(d_model: int, n_warmup_steps: int) -> Callable:
    """Noam LR (reference: models/optim_schedule.py:29-41):
    d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def fn(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        return (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * (n_warmup_steps ** -1.5))

    return fn


def accumulate(tx: optax.GradientTransformation,
               every: int) -> optax.GradientTransformation:
    """Gradient accumulation: average grads over ``every`` micro-batches and
    apply the inner transform once (reference: pretrain default 4,
    main_origin.py:141-142; finetune steps every ``grad_accum`` batches,
    sc/finetune.py:461-470 — there the loss is divided by the accum count and
    grads summed, which equals the mean used here).  On non-apply micro-steps
    the returned updates are zeros, so callers that post-scale updates by a
    manual lr stay correct."""
    if every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every)


def scan_micro_steps(step: Callable, k: int, reuse_batch: bool = False
                     ) -> Callable:
    """``k`` train micro-steps inside ONE jit dispatch via ``lax.scan``.

    Per-dispatch host/runtime overhead (Python dispatch, transfer-guard
    checks, and on a remote-tunnel runtime the per-launch RPC) was measured
    at ~25% of wall step time at the flagship config; the scan amortizes it
    1/k.  The reference has no equivalent — each ``loss.backward()`` is its
    own launch (models/train_origin.py:96-107).

    ``step`` is any ``(state, batch, *extra) -> (state, metrics)`` train
    step; the ``*extra`` operands (rng, lr_scale, ...) are forwarded
    unchanged to every micro-step — per-micro-step divergence comes from the
    inner step folding ``state.step`` into its rng.

    - default: ``batch`` leaves carry a leading micro-step dim ``[k, B,
      ...]`` (see ``mesh.shard_stacked_batch``); scan feeds one micro-batch
      per iteration.  Composes with ``optim.accumulate`` (MultiSteps state
      advances inside the scan), so grad-accum costs no extra dispatches.
    - ``reuse_batch=True``: one ``[B, ...]`` batch reused for every
      micro-step (synthetic-data benches only).

    Returns ``(state, metrics)`` with metrics stacked ``[k, ...]`` — callers
    log per-micro-step or take ``[-1]``."""

    def multi_step(state, batch, *extra):
        def body(carry, xs):
            return step(carry, batch if reuse_batch else xs, *extra)

        return jax.lax.scan(body, state, None if reuse_batch else batch,
                            length=k if reuse_batch else None)

    return multi_step


def masked_trainable(tx: optax.GradientTransformation,
                     trainable_mask) -> optax.GradientTransformation:
    """Freeze params where mask is False (reference partial CNN freeze,
    models/cxrbert_origin.py:66-70, and the classification-time re-freeze of
    img/txt submodules, mmbt/main.py:204-209).

    ``trainable_mask`` may be a bool pytree or a callable ``params -> bool
    pytree`` (so the wrap can happen before the params exist)."""
    to_labels = lambda m: jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", m)
    labels = ((lambda params: to_labels(trainable_mask(params)))
              if callable(trainable_mask) else to_labels(trainable_mask))
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def stop_frozen(params, trainable_mask):
    """``lax.stop_gradient`` on frozen leaves inside a loss_fn.

    Frozen-param grads become symbolic zeros, and — because the frozen CNN
    trunk sits at the very bottom of the network — XLA dead-code-eliminates
    the entire conv backward pass (including the bandwidth-heaviest
    256²/128²-spatial convs at 512 px input).  The
    optimizer-side mask (``masked_trainable``) is still required so weight
    decay does not move the frozen params."""
    return jax.tree_util.tree_map(
        lambda p, t: p if t else jax.lax.stop_gradient(p),
        params, trainable_mask)
