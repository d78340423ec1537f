"""Loss functions matching reference semantics exactly.

- `cross_entropy_ignore_index`: torch CrossEntropyLoss(ignore_index=-100,
  reduction='mean') (reference: models/train_origin.py:62-63).
- `label_smoothing_loss`: KL-div label smoothing with ignore_index masking
  (reference: sc/pytorch_pretrained_bert/loss.py:12-48).
- `drop_worst_normalize`: Ruotian-Luo drop-worst + masked-weight
  normalization (reference: sc/pytorch_pretrained_bert/model.py:1003-1010,
  loss_mask_and_normalize).
- `bce_with_logits`: VQA soft-target BCE (reference: model.py:944).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def cross_entropy_ignore_index(logits: jnp.ndarray, labels: jnp.ndarray,
                               ignore_index: int = IGNORE_INDEX):
    """logits [..., V] fp32, labels [...] int.  Mean over non-ignored.

    Returns (loss, n_valid).  With zero valid labels returns 0 (torch would
    return NaN; the reference guarantees >= 1 masked token per sample,
    data/dataset_origin.py:204-208).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_labels[..., None],
                               axis=-1)[..., 0]
    nll = (logz - gold) * valid
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n, valid.sum()


def cross_entropy_per_example(logits: jnp.ndarray,
                              labels: jnp.ndarray) -> jnp.ndarray:
    """Unreduced CE, no ignore handling: [..., V], [...] -> [...]."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - gold


def label_smoothing_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                         smoothing: float, vocab_size: int,
                         ignore_index: int = 0) -> jnp.ndarray:
    """Per-position KL(label-smoothed one-hot || softmax) with ignore_index
    zeroing, reduction='none' then summed over vocab (reference:
    loss.py:12-48: confidence=1-eps, rest eps/(V-2), ignore col zeroed)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (vocab_size - 2)
    # one_hot true dist: `low` everywhere, `confidence` at target,
    # 0 at ignore_index column
    V = logits.shape[-1]
    true_dist = jnp.full(logits.shape, low, dtype=jnp.float32)
    true_dist = jnp.where(
        jax.nn.one_hot(labels, V, dtype=jnp.bool_), confidence, true_dist)
    col = jnp.zeros((V,), jnp.float32).at[ignore_index].set(1.0)
    true_dist = true_dist * (1.0 - col)  # zero the ignore column
    # rows whose target is ignore_index contribute zero
    row_mask = (labels != ignore_index)[..., None]
    true_dist = jnp.where(row_mask, true_dist, 0.0)
    # KLDivLoss(reduction='none').sum(-1) == sum p*(log p - log q); torch's
    # kl_div uses target*(log(target)-input); reference sums over vocab
    eps = 1e-20
    kl = true_dist * (jnp.log(true_dist + eps) - logp)
    return kl.sum(-1)


def drop_worst_normalize(loss: jnp.ndarray, weights: jnp.ndarray,
                         drop_worst_ratio: float) -> jnp.ndarray:
    """loss [B, P], weights [B, P] -> scalar.

    Keeps the (1-ratio) fraction of examples with the *smallest* summed loss,
    then normalizes by the kept examples' total weight
    (reference: model.py:1003-1010).
    """
    loss = loss * weights
    B = loss.shape[0]
    keep = int(B * (1.0 - drop_worst_ratio))
    per_ex = loss.sum(-1)
    # torch.topk(largest=False) -> smallest `keep`
    neg_top, keep_idx = jax.lax.top_k(-per_ex, keep)
    keep_loss = -neg_top
    denom = weights.sum(-1)[keep_idx].sum() + 1e-5
    return (keep_loss / denom).sum()


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def weighted_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                             pos_weight: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogitsLoss(pos_weight=...) (reference: mmbt/main.py:93-104)."""
    logits = logits.astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_sig + (1 - targets) * log_one_minus)
    return loss.mean()
