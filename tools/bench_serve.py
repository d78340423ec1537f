"""End-to-end serving throughput: reports/sec through the real HTTP
endpoint (cli/serve_main.py) at the flagship decode config.

Builds a synthetic 30522-token vocab and a random-init orbax checkpoint,
starts the server in-process on an ephemeral port, then fires ``--requests``
concurrent POST /generate calls (base64 PNGs, so the measurement includes
image upload, PIL decode, the resize/normalize transform, micro-batching,
and detokenization — everything a production client pays), and prints one
JSON line with reports/sec.

Usage:  python tools/bench_serve.py [--batch_size 8] [--requests 32]
        [--img_size 512] [--len_vis_input 256] [--max_txt_length 128]

Device-side context for the overhead read-out: the bare jitted greedy decode
measured 5156 tok/s at batch 32 and 4128 tok/s at batch 8 (DESIGN.md §6) —
at 128 tokens/report that is ~40.3 / ~32 reports/s of pure device capacity.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def make_fixture(d: str, vocab_size: int, args) -> tuple[str, str]:
    """Synthetic vocab file + random-init orbax checkpoint at the serve
    config (throughput does not depend on the weights)."""
    import jax
    import jax.numpy as jnp

    from medvill_tpu.core import checkpoint as ckpt_lib
    from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                         ImageEncoderConfig)
    from medvill_tpu.train import finetune as ft

    vocab_path = os.path.join(d, "vocab.txt")
    with open(vocab_path, "w") as f:
        for tok in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]:
            f.write(tok + "\n")
        for i in range(vocab_size - 5):
            f.write(f"tok{i}\n")

    bert = BertConfig.vlp(
        BertConfig.from_name("bert-base-scratch", vocab_size))
    cfg = FinetuneConfig(
        max_seq_length=args.max_txt_length + args.len_vis_input + 3,
        len_vis_input=args.len_vis_input, img_size=args.img_size, bert=bert,
        image=ImageEncoderConfig(num_image_embeds=args.len_vis_input,
                                 img_size=args.img_size,
                                 encoder="full-fiber"))
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, args.img_size, args.img_size, 3)),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    ckpt = os.path.join(d, "ckpt")
    ckpt_lib.save(ckpt, 0, {"params": variables["params"],
                            "batch_stats": variables.get("batch_stats", {})})
    return vocab_path, ckpt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--len_vis_input", type=int, default=256)
    ap.add_argument("--max_txt_length", type=int, default=128)
    ap.add_argument("--vocab_size", type=int, default=30522)
    ap.add_argument("--max_wait_ms", type=int, default=25)
    args = ap.parse_args()

    from PIL import Image

    from medvill_tpu.cli import serve_main

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    logger = logging.getLogger("bench-serve")
    with tempfile.TemporaryDirectory() as d:
        vocab, ckpt = make_fixture(d, args.vocab_size, args)
        sargs = serve_main.build_parser().parse_args([
            "--vocab_file", vocab, "--model_recover_path", ckpt,
            "--host", "127.0.0.1", "--port", "0",
            "--batch_size", str(args.batch_size),
            "--max_wait_ms", str(args.max_wait_ms),
            "--max_txt_length", str(args.max_txt_length),
            "--len_vis_input", str(args.len_vis_input),
            "--img_size", str(args.img_size),
            "--vocab_size", str(args.vocab_size),
        ])
        server = serve_main.make_server(sargs, logger)  # warms up (compiles)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        addr = server.server_address

        rng = np.random.default_rng(0)
        payloads = []
        for i in range(args.requests):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255,
                                         (args.img_size, args.img_size),
                                         np.uint8), "L").save(buf, "PNG")
            payloads.append(json.dumps(
                {"image_b64": base64.b64encode(buf.getvalue()).decode()}
            ).encode())

        results = [None] * args.requests

        def call(i):
            req = urllib.request.Request(
                f"http://{addr[0]}:{addr[1]}/generate", data=payloads[i],
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                results[i] = json.loads(r.read())

        # one throwaway request primes any lazy host paths
        call(0)
        t0 = time.perf_counter()
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(args.requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        assert all(r and isinstance(r.get("caption"), str)
                   for r in results), "a request failed"
        server.shutdown()
        print(json.dumps({
            "metric": "serving_reports_per_sec",
            "value": round(args.requests / dt, 2),
            "unit": "reports/sec end-to-end HTTP (batch %d, %d tok max, "
                    "%d concurrent)" % (args.batch_size,
                                        args.max_txt_length, args.requests),
        }))


if __name__ == "__main__":
    main()
