"""Report-generation serving endpoint (beyond parity — the reference ships
no inference server; its only decode path is the offline eval script
sc/generation_decode.py).

TPU-shaped serving design: ONE fixed-batch KV-cached decode program is
compiled up front (static shapes — no per-request recompiles), requests are
dynamically micro-batched by a single dispatcher thread (short batches pad
by repeating the last row, the padded rows are discarded), and the HTTP
layer stays on host threads so image decode overlaps device execution.

API:
  GET  /healthz            -> {"status": "ok", model/config info}
  POST /generate           -> {"caption": ...}    (single image)
       body JSON: {"image_b64": <base64 bytes of any PIL-decodable image>}
                  or {"image_path": <server-local path>}
  POST /reload             -> hot-swap the served weights without a
       recompile (params are jit arguments, same shapes reuse the program)
       body JSON: {"model_recover_path": <orbax dir or torch .bin>}
       (omit to re-read the current path, e.g. a fresher epoch)

Checkpoint recovery accepts the same forms as the decode CLI: an orbax run
dir or a torch model.{epoch}.bin finetune checkpoint (with the reference's
bert.-prefix key remap, generation_decode.py:377-410).
"""
from __future__ import annotations

import argparse
import base64
import dataclasses
import io
import itertools
import json
import os
import queue
import signal
import threading
import time

import numpy as np

from medvill_tpu.cli import sampling_kwargs, str2bool, str2bool_or_auto
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig)
from medvill_tpu.data import images as image_lib
from medvill_tpu.data.tokenization import BertTokenizer, caption_from_ids
from medvill_tpu.models.decoder import (DecodeSettings, beam_search,
                                        greedy_decode,
                                        note_unrolled_decode_ran,
                                        resolve_scan_layers,
                                        unrolled_warm_key)
from medvill_tpu.train import finetune as ft
from medvill_tpu.utils.logging import create_logger
from medvill_tpu.utils.seed import set_seed


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--vocab_file", type=str, required=True)
    p.add_argument("--model_recover_path", type=str, required=True,
                   help="orbax checkpoint dir OR torch model.{epoch}.bin")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8390)
    p.add_argument("--batch_size", type=int, default=8,
                   help="compiled decode batch; requests are micro-batched "
                        "up to this size")
    p.add_argument("--max_wait_ms", type=int, default=25,
                   help="micro-batching window: how long the dispatcher "
                        "waits to fill a batch after the first request")
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--do_sample", type=str2bool, default=False,
                   help="multinomial sampling instead of argmax (requires "
                        "--beam_size 1); a fresh key is folded in per "
                        "micro-batch so repeated requests vary")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="sampling temperature (only with --do_sample)")
    p.add_argument("--top_k", type=int, default=0,
                   help="top-k sampling filter (0 = off; --do_sample only)")
    p.add_argument("--top_p", type=float, default=1.0,
                   help="nucleus sampling mass (1.0 = off; --do_sample "
                        "only)")
    p.add_argument("--length_penalty", type=float, default=0.0)
    p.add_argument("--forbid_duplicate_ngrams", type=str2bool, default=False)
    p.add_argument("--ngram_size", type=int, default=3)
    p.add_argument("--min_len", type=int, default=0)
    p.add_argument("--scan_layers", type=str2bool_or_auto, default="auto",
                   help="lax.scan over stacked layer params (fast cold "
                        "compile); false = unrolled, ~1.5x faster "
                        "steady-state decode for servers with a warm "
                        "compile cache; auto (default) = unrolled exactly "
                        "when this decode program is warm in the durable "
                        "persistent cache (DESIGN.md §6)")
    p.add_argument("--scan_unroll", type=int, default=1)
    p.add_argument("--max_txt_length", type=int, default=128)
    p.add_argument("--len_vis_input", type=int, default=256)
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--max_seq_length", type=int, default=None)
    p.add_argument("--new_segment_ids", type=str2bool, default=True)
    p.add_argument("--bert_model", type=str, default="bert-base-scratch")
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--relax_projection", action="store_true")
    p.add_argument("--decode_positions", type=str, default="auto",
                   choices=["auto", "reference", "train", "global"])
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--warmup", type=str2bool, default=True,
                   help="compile + run one dummy batch before accepting "
                        "requests (first XLA compile takes minutes)")
    return p


def build_engine(args, logger):
    """Model + recovered variables + ONE jitted fixed-batch decode fn.
    Returns (run(images[B,H,W,3]) -> ids[B,T], tokenizer,
    reload_weights(path) -> kind)."""
    import jax
    import jax.numpy as jnp

    from medvill_tpu.cli.decode_main import _resolve_positions

    set_seed(args.seed)
    tokenizer = BertTokenizer.from_vocab_file(args.vocab_file)
    bert = BertConfig.vlp(
        BertConfig.from_name(args.bert_model, args.vocab_size),
        new_segment_ids=args.new_segment_ids)
    if args.relax_projection:
        bert = dataclasses.replace(bert, relax_projection=4)
    if args.config_path:
        bert = BertConfig.from_reference_json(args.config_path, base=bert)
    if args.max_seq_length is None:
        args.max_seq_length = args.max_txt_length + args.len_vis_input + 3
    cfg = FinetuneConfig(
        max_seq_length=args.max_seq_length,
        len_vis_input=args.len_vis_input, img_size=args.img_size,
        new_segment_ids=args.new_segment_ids, bert=bert,
        image=ImageEncoderConfig(num_image_embeds=args.len_vis_input,
                                 img_size=args.img_size,
                                 encoder="full-fiber"))
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    init_vars = model.init(
        {"params": jax.random.PRNGKey(args.seed)},
        jnp.zeros((2, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    init_tree = {"params": init_vars["params"],
                 "batch_stats": init_vars.get("batch_stats", {})}

    def recover(path):
        """Checkpoint -> variables tree (torch .bin file or orbax dir)."""
        if os.path.isfile(path):
            from medvill_tpu.core import torch_init

            new_params, new_bs = torch_init.init_vlp_from_torch(
                init_tree["params"], init_tree["batch_stats"], path)
            return {"params": new_params, "batch_stats": new_bs}, "torch"
        epoch = ckpt_lib.latest_epoch(path)
        if epoch is None:
            raise FileNotFoundError(
                f"model_recover_path {path}: not a torch checkpoint file "
                "and no orbax epoch found — refusing to serve random init")
        restored = ckpt_lib.restore(path, epoch, init_tree, partial=True)
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}, "orbax"

    variables, ckpt_kind = recover(args.model_recover_path)
    logger.info("recovered %s checkpoint %s", ckpt_kind,
                args.model_recover_path)

    v = tokenizer.vocab
    warm_key = unrolled_warm_key(cfg.bert, args.batch_size, args.beam_size,
                                 args.max_txt_length, args.len_vis_input)
    scan_layers = resolve_scan_layers(args.scan_layers, warm_key, logger)
    settings = DecodeSettings(
        max_txt_length=args.max_txt_length, mask_word_id=v["[MASK]"],
        eos_id=v["[SEP]"], beam_size=args.beam_size,
        length_penalty=args.length_penalty,
        forbid_duplicate_ngrams=args.forbid_duplicate_ngrams,
        ngram_size=args.ngram_size, min_len=args.min_len,
        new_segment_ids=args.new_segment_ids,
        window_positions=_resolve_positions(args, ckpt_kind, logger),
        scan_layers=scan_layers, scan_unroll=args.scan_unroll,
        **sampling_kwargs(args, args.beam_size))

    # variables must be a jit ARGUMENT, not a closure capture: captured
    # trees are baked into the HLO as constants (a ~440 MB program that the
    # remote-tunnel compile service rejects with HTTP 413) and would
    # re-trace on every weight refresh
    live = {"variables": jax.device_put(variables)}
    if args.beam_size > 1:
        run_b = jax.jit(lambda vs, im: beam_search(
            model, vs, im, settings, v["[CLS]"], v["[SEP]"])[0])
        run = lambda im: np.asarray(run_b(live["variables"], im))
    elif settings.sample_mode == "sample":
        # key is a jit ARGUMENT folded per micro-batch on the host, so the
        # compiled program is reused while every batch draws fresh samples
        run_s = jax.jit(lambda vs, im, key: greedy_decode(
            model, vs, im, settings, v["[CLS]"], v["[SEP]"], rng=key)[0])
        base_key = jax.random.PRNGKey(args.seed)
        counter = itertools.count()

        def run(im):
            key = jax.random.fold_in(base_key, next(counter))
            return np.asarray(run_s(live["variables"], im, key))
    else:
        run_g = jax.jit(lambda vs, im: greedy_decode(
            model, vs, im, settings, v["[CLS]"], v["[SEP]"])[0])
        run = lambda im: np.asarray(run_g(live["variables"], im))

    if not scan_layers:
        # first completed batch on the unrolled backend -> record that its
        # program reached the durable persistent cache, so later 'auto'
        # servers of this config start on the fast backend (marked only
        # after a successful dispatch; see note_unrolled_decode_ran)
        inner_run, _noted = run, []

        def run(im, _inner=inner_run):  # noqa: F811
            out = _inner(im)
            if not _noted:
                note_unrolled_decode_ran(warm_key)
                _noted.append(True)
            return out

    def reload_weights(path: str) -> str:
        """Hot-swap the served weights (e.g. a fresher finetune epoch).
        Same shapes -> the compiled program is reused as-is.  The dict-slot
        assignment is atomic under the GIL and the single dispatcher thread
        reads it once per micro-batch, so every batch runs against one
        consistent tree (old or new, never a mix)."""
        new_vars, kind = recover(path)
        live["variables"] = jax.device_put(new_vars)
        logger.info("reloaded %s checkpoint %s", kind, path)
        return kind

    return run, tokenizer, reload_weights


class ServerClosing(Exception):
    """Raised by submit() after close(): request arrived during drain."""


class MicroBatcher:
    """Single dispatcher thread: collects requests for up to max_wait_ms
    (or until the compiled batch fills), pads short batches by repeating
    the last image, runs the jitted decode, fans results back out."""

    def __init__(self, run, batch_size: int, max_wait_ms: int):
        self._run = run
        self._B = batch_size
        self._wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        # operational counters exposed at GET /metrics (Prometheus text
        # exposition); incremented under the lock from handler threads and
        # the dispatcher thread
        self.stats = {"requests_total": 0, "errors_total": 0,
                      "batches_total": 0, "padded_rows_total": 0,
                      "decode_seconds_total": 0.0,
                      "request_latency_seconds_total": 0.0}
        self._stats_lock = threading.Lock()
        self._closing = False
        self._busy = False
        # HTTP handler threads currently between accept and response —
        # includes requests still parsing/decoding that have not reached
        # submit() yet; drain() must wait for these too or the process
        # exit would reset their connections (handler threads are daemon)
        self._http_inflight = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def enter_http(self) -> None:
        with self._stats_lock:
            self._http_inflight += 1

    def exit_http(self) -> None:
        with self._stats_lock:
            self._http_inflight -= 1

    def close(self) -> None:
        """Stop accepting new requests (graceful shutdown, SIGTERM)."""
        self._closing = True

    def drain(self, timeout: float = 30.0) -> bool:
        """Wait until every already-accepted request has been answered
        (batcher queue empty, no decode in flight, no HTTP handler mid-
        request).  Call close() first; returns False on timeout."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._stats_lock:
                http_idle = self._http_inflight == 0
            if self._q.empty() and not self._busy and http_idle:
                return True
            time.sleep(0.05)
        return False

    def submit(self, image: np.ndarray) -> str:
        """Blocks until the caption for `image` [H, W, 3] is ready."""
        if self._closing:
            raise ServerClosing("server is shutting down")
        t0 = time.monotonic()
        done = threading.Event()
        slot = {"done": done}
        self._q.put((image, slot))
        done.wait()
        with self._stats_lock:
            self.stats["requests_total"] += 1
            self.stats["request_latency_seconds_total"] += (
                time.monotonic() - t0)
            if "error" in slot:
                self.stats["errors_total"] += 1
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["ids"]

    def _loop(self):
        while True:
            items = [self._q.get()]
            self._busy = True
            deadline = time.monotonic() + self._wait_s
            while len(items) < self._B:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            images = [it[0] for it in items]
            n_real = len(images)
            if n_real < self._B:
                images = images + [images[-1]] * (self._B - n_real)
            t0 = time.monotonic()
            try:
                import jax.numpy as jnp

                ids = self._run(jnp.asarray(np.stack(images)))
            except Exception as e:  # fan the failure out to every waiter
                for _, slot in items:
                    slot["error"] = repr(e)
                    slot["done"].set()
                self._busy = False
                continue
            finally:
                with self._stats_lock:
                    self.stats["batches_total"] += 1
                    self.stats["padded_rows_total"] += self._B - n_real
                    self.stats["decode_seconds_total"] += (
                        time.monotonic() - t0)
            for i, (_, slot) in enumerate(items):
                slot["ids"] = ids[i]
                slot["done"].set()
            self._busy = False


def make_handler(batcher: MicroBatcher, tokenizer, args, logger,
                 reload_weights=None):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # route to our logger, not stderr
            logger.info("%s " + fmt, self.address_string(), *a)

        def do_GET(self):
            batcher.enter_http()
            try:
                self._do_get()
            finally:
                batcher.exit_http()

        def do_POST(self):
            batcher.enter_http()
            try:
                self._do_post()
            finally:
                batcher.exit_http()

        def _do_get(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok",
                    "model_recover_path": args.model_recover_path,
                    "batch_size": args.batch_size,
                    "beam_size": args.beam_size,
                    "max_txt_length": args.max_txt_length})
            elif self.path == "/metrics":
                # Prometheus text exposition (no client lib in the image);
                # counters only — the scraper derives rates/averages
                with batcher._stats_lock:
                    stats = dict(batcher.stats)
                lines = ["# TYPE medvill_serve_compiled_batch_size gauge",
                         f"medvill_serve_compiled_batch_size {batcher._B}"]
                for k, v in sorted(stats.items()):
                    lines.append(f"# TYPE medvill_serve_{k} counter")
                    lines.append(f"medvill_serve_{k} {v}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._reply(404, {"error": "unknown path"})

        MAX_BODY = 64 << 20  # one 512x512 PNG is ~0.5 MB; 64 MB is ample

        def _body(self):
            length = int(self.headers.get("Content-Length", 0))
            if length > self.MAX_BODY:
                raise ValueError(f"body {length} bytes > {self.MAX_BODY}")
            return self.rfile.read(length) or b"{}"

        def _do_post(self):
            if self.path == "/reload":
                try:
                    req = json.loads(self._body())
                    path = req.get("model_recover_path",
                                   args.model_recover_path)
                    kind = reload_weights(path)
                except FileNotFoundError as e:
                    self._reply(404, {"error": str(e)})
                    return
                except Exception as e:
                    self._reply(400, {"error": f"bad request: {e!r}"})
                    return
                args.model_recover_path = path  # /healthz reflects it
                self._reply(200, {"status": "reloaded", "kind": kind,
                                  "model_recover_path": path})
                return
            if self.path != "/generate":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                req = json.loads(self._body())
                if "image_b64" in req:
                    raw = io.BytesIO(base64.b64decode(req["image_b64"]))
                    image = _load(raw, args)
                elif "image_path" in req:
                    image = _load(req["image_path"], args)
                else:
                    self._reply(400, {"error":
                                      "need image_b64 or image_path"})
                    return
            except Exception as e:
                self._reply(400, {"error": f"bad request: {e!r}"})
                return
            try:
                ids = batcher.submit(image)
            except ServerClosing as e:
                self._reply(503, {"error": str(e)})
                return
            except RuntimeError as e:
                self._reply(500, {"error": str(e)})
                return
            self._reply(200,
                        {"caption": caption_from_ids(tokenizer, ids)})

    return Handler


def _load(path_or_file, args) -> np.ndarray:
    """Same transform stack as decode eval (load_image handles paths and
    file objects — PIL's Image.open accepts both)."""
    return image_lib.load_image(
        path_or_file, args.img_size, grayscale_to_rgb=True,
        do_resize=(args.len_vis_input < 100))


def make_server(args, logger):
    """Build engine + micro-batcher + HTTP server (not yet serving)."""
    from http.server import ThreadingHTTPServer

    run, tokenizer, reload_weights = build_engine(args, logger)
    if args.warmup:
        t0 = time.perf_counter()
        rng = np.random.default_rng(0)
        # uint8: the exact wire format _load produces, so this warmup
        # compiles the same program the requests will hit
        dummy = rng.integers(0, 255, (args.batch_size, args.img_size,
                                      args.img_size, 3)).astype(np.uint8)
        _ = run(dummy)
        logger.info("warmup compile+run: %.1fs", time.perf_counter() - t0)
    batcher = MicroBatcher(run, args.batch_size, args.max_wait_ms)
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(batcher, tokenizer, args, logger, reload_weights))
    server.batcher = batcher  # for graceful drain (main) and tests
    return server


def install_graceful_shutdown(server, logger,
                              signals=(signal.SIGTERM,)) -> None:
    """SIGTERM: stop accepting (new submits get 503), let the serve loop
    exit, then main() drains already-accepted requests before exiting —
    the serving half of the trainer-side preemption story
    (utils/preempt.py)."""

    def handler(signum, frame):
        logger.info("signal %d: draining in-flight requests, then "
                    "shutting down", signum)
        server.batcher.close()
        # shutdown() must not run on the thread inside serve_forever()
        # (it joins the serve loop) — and the signal handler runs there
        threading.Thread(target=server.shutdown, daemon=True).start()

    for s in signals:
        signal.signal(s, handler)


def main(args):
    logger = create_logger(None, args)
    server = make_server(args, logger)
    install_graceful_shutdown(server, logger)
    logger.info("serving on http://%s:%d (batch %d, wait %dms)",
                *server.server_address, args.batch_size, args.max_wait_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    if server.batcher.drain(timeout=30.0):
        logger.info("drained; exiting 0")
    else:
        logger.warning("drain timed out with requests still queued")


if __name__ == "__main__":
    main(build_parser().parse_args())
