"""Capture a device trace of the pretrain train step and print the per-op
category breakdown (supports the DESIGN.md §4 time-split numbers).

Usage: python tools/profile_pretrain.py [batch] [mode] — same knobs as
bench.py.  Writes the trace under /tmp/medvill_trace/ and prints the top
XLA ops by total device time parsed from the .xplane.pb.
"""
from __future__ import annotations

import collections
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/medvill_trace"


def run_step_under_trace(batch: int, mode: str) -> None:
    import dataclasses

    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.models import resnet as resnet_lib
    from medvill_tpu.train import optim
    from medvill_tpu.train.pretrain import init_state, make_train_step

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    remat = mode in ("remat", "rematall")
    cfg = PretrainConfig(
        batch_size=batch,
        bert=dataclasses.replace(BertConfig.base(), remat=remat),
        image=ImageEncoderConfig(img_size=512, num_image_embeds=180,
                                 remat_blocks=(mode == "rematall")),
        mlm_loss_chunk=128 if batch <= 96 else 64,
    )
    tx = optim.adamw(cfg.lr, cfg.beta1, cfg.beta2, cfg.eps, cfg.weight_decay)
    tx = optim.masked_trainable(
        tx, lambda p: resnet_lib.cnn_prefix_freeze_mask(
            p, ("enc", "img_encoder")))
    model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
    rng = np.random.default_rng(0)
    L_txt = cfg.seq_len + 1
    host_batch = dict(
        cls_tok=np.full((batch, 1), 101, np.int32),
        input_txt=rng.integers(0, cfg.bert.vocab_size,
                               (batch, L_txt)).astype(np.int32),
        txt_labels=np.where(rng.random((batch, cfg.total_len)) < 0.15,
                            rng.integers(0, cfg.bert.vocab_size,
                                         (batch, cfg.total_len)),
                            -100).astype(np.int32),
        mask_spec=np.stack([np.full(batch, 2, np.int32),
                            np.full(batch, L_txt, np.int32)], -1),
        segment=np.ones((batch, L_txt), np.int32),
        image=rng.standard_normal(
            (batch, cfg.image.img_size, cfg.image.img_size, 3)
        ).astype(np.float32),
        is_aligned=rng.integers(0, 2, (batch,)).astype(np.int32),
        sep_tok=np.full((batch, 1), 102, np.int32),
    )
    dev_batch = jax.tree_util.tree_map(jnp.asarray, host_batch)
    key = jax.random.PRNGKey(1)
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    state, m = step(state, dev_batch, key)
    _ = float(m["loss"])  # compile + warmup

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, m = step(state, dev_batch, key)
        _ = float(m["loss"])
    jax.profiler.stop_trace()


def parse_xplane() -> None:
    """Aggregate device-op durations from the newest xplane proto using the
    tensorflow profiler proto parser if available, else raw scan."""
    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no xplane captured")
        return
    path = paths[-1]
    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    except Exception:
        pass
    # xplane proto: parse with the xprof/tensorboard-plugin if installed
    try:
        from xprof.convert import raw_to_tool_data as rtd  # type: ignore

        data, _ = rtd.xspace_to_tool_data([path], "op_profile", {})
        print(data[:4000])
        return
    except Exception:
        pass
    # fallback: protobuf-less coarse scan — pull op names + durations via
    # the XSpace wire format is overkill; instead report file location
    print(f"trace written: {path}")
    print("open with xprof/tensorboard for the op breakdown")


def summarize_with_tb(path_hint: str = TRACE_DIR) -> None:
    pass


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    mode = sys.argv[2] if len(sys.argv) > 2 else "remat"
    run_step_under_trace(batch, mode)
    parse_xplane()
