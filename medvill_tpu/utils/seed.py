"""Seeding + misc utilities (reference: utils/utils.py).

`set_seed` seeds python/numpy (reference: utils/utils.py:9-16 also sets
torch/cudnn-deterministic; JAX determinism is structural via explicit
PRNGKeys, so there is no global device RNG to seed).
`numpy_seed` is the scoped-seed context manager (utils/utils.py:52-66).
"""
from __future__ import annotations

import contextlib
import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def use_hardware_prng() -> None:
    """Switch jax.random's default key implementation to ``rbg``.

    The default threefry2x32 is computed in software on the VPU — at the
    pretrain config the per-layer dropout masks alone cost ~5% of step time
    (measured 220.6 vs 210.8 pairs/s).  ``rbg`` uses the TPU's hardware RNG
    path; dropout streams change (they are arbitrary anyway) but shapes and
    semantics do not.  Called by the training CLIs and bench before any key
    is created; tests keep the default for reproducibility of recorded
    expectations."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")


@contextlib.contextmanager
def numpy_seed(seed, *addl_seeds):
    """Scoped numpy seed; state restored on exit (reference:
    utils/utils.py:52-66)."""
    if seed is None:
        yield
        return
    if len(addl_seeds) > 0:
        seed = int(hash((seed, *addl_seeds)) % 1e6)
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)


def truncate_seq_pair(tokens_a, tokens_b, max_length) -> None:
    """Trim the longer of two sequences until the pair fits (reference:
    utils/utils.py:29-42)."""
    while len(tokens_a) + len(tokens_b) > max_length:
        if len(tokens_a) > len(tokens_b):
            tokens_a.pop()
        else:
            tokens_b.pop()
