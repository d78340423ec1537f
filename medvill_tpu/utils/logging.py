"""Logging + metric recording.

Replaces the reference's wandb-as-system-of-record (reference:
main_origin.py:24, models/train_origin.py:150-169, sc/finetune.py:193-209)
with a dependency-free ``MetricLogger`` that keeps *identical metric keys*
so dashboards port over: it appends JSONL locally, mirrors to wandb when the
package is importable, and prints at ``log_freq``.

`create_logger` reproduces utils/logger.py:9-58: an elapsed-time formatter
with file + console handlers that dumps the config on creation.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def drain_metrics(vals) -> list:
    """Flatten a list of per-dispatch DEVICE metric values to host floats
    with one device→host transfer per distinct entry shape (grouped
    multi-step dispatches append [k]-vectors, epoch tails and single steps
    scalars) instead of one transfer per dispatch.  The CLI train loops
    deliberately keep metrics on device during the epoch (a per-step
    ``float()`` serializes dispatch on the host RTT); this is the matching
    epoch-end drain — per-entry ``np.asarray`` reads would stall an epoch
    boundary by minutes on a remote-tunnel chip (26-60 ms/read)."""
    import jax.numpy as jnp
    import numpy as np

    by_shape: Dict[tuple, list] = {}
    for v in vals:
        by_shape.setdefault(tuple(jnp.shape(v)), []).append(v)
    out = []
    for vs in by_shape.values():
        out.extend(float(x) for x in np.asarray(jnp.stack(vs)).reshape(-1))
    return out


class ElapsedFormatter(logging.Formatter):
    """Prefix records with elapsed wall-clock (reference:
    utils/logger.py LogFormatter)."""

    def __init__(self):
        super().__init__()
        self.start = time.time()

    def format(self, record):
        elapsed = int(record.created - self.start)
        prefix = "%s - %02d:%02d:%02d" % (
            time.strftime("%x %X"), elapsed // 3600,
            (elapsed % 3600) // 60, elapsed % 60)
        msg = record.getMessage()
        return f"{prefix} - {msg}"


def create_logger(filepath: Optional[str] = None,
                  args: Optional[Any] = None) -> logging.Logger:
    logger = logging.getLogger("medvill_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = ElapsedFormatter()
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filepath:
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        fh = logging.FileHandler(filepath)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if args is not None:
        d = args.__dict__ if hasattr(args, "__dict__") else dict(args)
        for k in sorted(d):
            logger.info("%s: %s", k, d[k])
    return logger


class MetricLogger:
    """Append-only JSONL metrics + optional wandb mirror.

    Keys mirror the reference's wandb.log calls (e.g. 'avg_loss',
    'avg_mlm_loss', 'avg_itm_loss', 'mlm_acc', 'itm_acc', 'eval_*';
    reference: models/train_origin.py:150-169,233-252).
    """

    def __init__(self, output_dir: str = "", project: str = "medvill-tpu",
                 config: Optional[dict] = None, use_wandb: bool = True):
        self.path = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self.path = os.path.join(output_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401

                self._wandb = wandb
                self._wandb.init(project=project, config=config or {})
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()}
        if step is not None:
            rec["step"] = int(step)
        rec["ts"] = time.time()
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, step=step)
            except Exception:
                pass

    def finish(self):
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


def _l2_norm(tree) -> Optional[float]:
    """Global L2 norm over a pytree's floating arrays (None if empty)."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)
              and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return None
    total = jax.jit(lambda ls: jnp.sqrt(sum(
        jnp.vdot(l.astype(jnp.float32), l.astype(jnp.float32))
        for l in ls)))(leaves)
    return float(total)


def watch_norms(state) -> Dict[str, float]:
    """``wandb.watch(model)`` equivalent (reference:
    models/train_origin.py:51): periodic parameter/gradient summaries.
    wandb.watch logs parameter + gradient HISTOGRAMS every 1000 steps; the
    TPU-native equivalent logs global and per-top-level-module L2 norms of
    the parameters plus the Adam first-moment norm (the gradient EMA — the
    gradient signal available outside the jitted step), into the same
    JSONL/wandb mirror.  Called off the hot path at a configurable
    interval, so the compiled train step is unchanged."""
    import jax

    out: Dict[str, float] = {}
    g = _l2_norm(state.params)
    if g is not None:
        out["watch/param_norm"] = g
    for name in sorted(state.params):
        n = _l2_norm(state.params[name])
        if n is not None:
            out[f"watch/param_norm/{name}"] = n
    # Adam first moments: tree_leaves with an is_leaf trap for the
    # ScaleByAdamState namedtuples (possibly nested under masking/chains)
    adam_states = [s for s in jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(s, "mu")]
    mus = [s.mu for s in adam_states]
    if mus:
        n = _l2_norm(mus)
        if n is not None:
            out["watch/grad_ema_norm"] = n
    return out
