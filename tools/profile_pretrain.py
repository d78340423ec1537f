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

    from medvill_tpu.utils import jax_cache
    jax_cache.enable()  # durable machine-keyed persistent compile cache

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
        tx, lambda p: resnet_lib.cnn_freeze_mask(
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
    """Aggregate device time by module (provenance) and op category from the
    newest xplane via xprof's op_profile converter."""
    import json

    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no xplane captured")
        return
    path = paths[-1]
    from xprof.convert import raw_to_tool_data as rtd  # type: ignore

    data, _ = rtd.xspace_to_tool_data([path], "op_profile", {})
    tree = json.loads(data if isinstance(data, str) else data.decode())
    with open("/tmp/op_profile.json", "w") as f:
        json.dump(tree, f)

    by_module = collections.Counter()
    by_category = collections.Counter()
    detail = collections.Counter()

    def module_of(provenance: str) -> str:
        # attention FIRST: kernel ops are scoped under enc/encoder/layer_N
        # too, so the encoder branch would otherwise swallow them and the
        # per-module split would report attention ~0
        if "flash" in provenance or "attention_kernel" in provenance:
            return "attention"
        if "img_encoder" in provenance:
            return "resnet_trunk"
        if "enc/encoder" in provenance or "bert/encoder" in provenance:
            return "bert_encoder"
        if "mlm" in provenance or "chunk" in provenance:
            return "mlm_head"
        if "transpose(jvp" in provenance or "/adamw" in provenance:
            return "optimizer_or_bwd"
        return "other"

    def leaf_provenance(node) -> str:
        xla = node.get("xla") or {}
        prov = xla.get("provenance") or ""
        if prov:
            return prov
        for c in node.get("children", []):
            p = leaf_provenance(c)
            if p:
                return p
        return ""

    def walk_dupes(node):
        """Visit 'X and its duplicate(s)' aggregation nodes (they carry the
        summed rawTime across occurrences)."""
        for c in node.get("children", []):
            name = c.get("name", "")
            if name.endswith("duplicate(s)") or not c.get("children"):
                t = c.get("metrics", {}).get("rawTime", 0)
                if t:
                    prov = leaf_provenance(c)
                    cat = ((c.get("children") or [c])[0].get("xla") or {}
                           ).get("category", "?")
                    mod = module_of(prov)
                    by_module[mod] += t
                    by_category[cat] += t
                    detail[(mod, cat)] += t
            else:
                walk_dupes(c)

    program = tree.get("byProgram", tree)
    walk_dupes(program)
    total = sum(by_module.values())
    print(f"\n== device time by module (total {total/1e9:.1f} ms for the "
          f"traced window) ==")
    for mod, t in by_module.most_common():
        print(f"  {mod:20s} {t/1e9:9.1f} ms  {100*t/total:5.1f}%")
    print("== by category ==")
    for cat, t in by_category.most_common(12):
        print(f"  {cat:28s} {t/1e9:9.1f} ms  {100*t/total:5.1f}%")
    print("== top (module, category) ==")
    for (mod, cat), t in detail.most_common(16):
        print(f"  {mod:18s} {cat:26s} {t/1e9:9.1f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse_xplane()
    else:
        batch = int(sys.argv[1]) if len(sys.argv) > 1 else 72
        mode = sys.argv[2] if len(sys.argv) > 2 else "remat"
        run_step_under_trace(batch, mode)
        parse_xplane()
