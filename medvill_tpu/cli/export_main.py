"""Export an orbax checkpoint to the reference's torch layouts.

Usage::

    python -m medvill_tpu.cli.export_main \
        --checkpoint out/run_dir [--epoch N] [--kind auto] \
        --output model.5.bin

Closes the interoperability loop: checkpoints trained here load back into
the reference's own scripts — ``CXRBERT.from_pretrained`` (retrieval.py:17-24)
for the pretrain layout (pass an HF-style directory: ``--output d/`` writes
``d/pytorch_model.bin``), ``--model_recover_path model.{N}.bin`` resume
(sc/finetune.py:330-357) and the decode recover (generation_decode.py:377-410)
for the finetune layout.  The inverse of the ``--bert_init_path`` /
``--load_pretrained_model`` / ``--model_recover_path`` torch ingestion the
other CLIs already accept.

No model construction is needed: the orbax tree is restored untyped and the
param-tree shape itself selects the layout (``detect_kind``).
"""
from __future__ import annotations

import argparse
import os
import sys

from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core import torch_export


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True,
                   help="orbax run dir (numbered epoch subdirs) or one "
                        "epoch dir")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch to export (default: latest)")
    p.add_argument("--kind", default="auto",
                   choices=["auto", "pretrain", "finetune", "mmbt",
                            "cnn_bert"],
                   help="target torch layout (auto-detected from the tree)")
    p.add_argument("--output", required=True,
                   help="output .bin/.pth file, or a directory (writes "
                        "<dir>/pytorch_model.bin — the HF from_pretrained "
                        "layout the published weights use)")
    return p.parse_args(argv)


def resolve_epoch_dir(checkpoint: str, epoch) -> str:
    if epoch is not None:
        return os.path.join(checkpoint, str(epoch))
    latest = ckpt_lib.latest_epoch(checkpoint)
    if latest is not None:
        return os.path.join(checkpoint, str(latest))
    # already an epoch dir (or 'best') — orbax will fail loudly if not
    return checkpoint


def main(argv=None) -> str:
    args = parse_args(argv)
    path = resolve_epoch_dir(args.checkpoint, args.epoch)
    # restore untyped: the saved TrainState dict {step, params, batch_stats,
    # opt_state} (core/checkpoint.py::save) comes back as nested numpy.
    # Restore ONLY params/batch_stats — opt_state is ~2x the params (Adam
    # mu/nu) and export never needs it, so a partial restore cuts I/O and
    # host RAM ~3x for real-size checkpoints.
    import jax
    import orbax.checkpoint as ocp

    abspath = os.path.abspath(path)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        meta_tree = getattr(getattr(ckptr.metadata(abspath), "item_metadata",
                                    None), "tree", None)
        if isinstance(meta_tree, dict) and "params" in meta_tree:
            skeleton = {k: jax.tree.map(lambda _: 0, meta_tree[k])
                        for k in ("params", "batch_stats") if k in meta_tree}
            state = ckptr.restore(abspath, args=ocp.args.PyTreeRestore(
                item=skeleton, partial_restore=True))
        else:  # bare param tree (no TrainState wrapper)
            state = ckptr.restore(abspath)
    params = state["params"] if isinstance(state, dict) and "params" in state \
        else state
    batch_stats = state.get("batch_stats", {}) if isinstance(state, dict) \
        else {}
    kind = args.kind if args.kind != "auto" else \
        torch_export.detect_kind(params)
    sd = torch_export.EXPORTERS[kind](params, batch_stats)
    out = args.output
    if os.path.isdir(out) or out.endswith(os.sep):
        os.makedirs(out, exist_ok=True)
        out = os.path.join(out, "pytorch_model.bin")
    torch_export.save_torch_checkpoint(sd, out)
    print(f"exported {kind} checkpoint ({len(sd)} tensors) from {path} "
          f"to {out}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
