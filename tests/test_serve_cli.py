"""Serving endpoint (beyond parity): fixed-batch compiled decode + dynamic
micro-batching behind HTTP.  Drives a real ThreadingHTTPServer on an
ephemeral port with concurrent clients so the pad-short-batch path and the
fan-out both execute."""
import base64
import io
import json
import os
import time
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from medvill_tpu.cli import serve_main
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig)
from medvill_tpu.data.tokenization import build_vocab
from medvill_tpu.train import finetune as ft

IMG = 64
VIS = 4


@pytest.fixture(scope="module")
def server_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_fixture")
    words = [f"word{i}" for i in range(40)]
    vocab = build_vocab(words)
    with open(d / "vocab.txt", "w") as f:
        for tok in vocab:
            f.write(tok + "\n")
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=len(vocab))),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=VIS,
                                 encoder="full-fiber"),
        len_vis_input=VIS, max_seq_length=24, max_pred=3, img_size=IMG)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    ckpt_lib.save(str(d / "model_a"), 0,
                  {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})})

    args = serve_main.build_parser().parse_args([
        "--vocab_file", str(d / "vocab.txt"),
        "--model_recover_path", str(d / "model_a"),
        "--host", "127.0.0.1", "--port", "0",  # ephemeral port
        "--batch_size", "2", "--max_wait_ms", "30",
        "--max_txt_length", "4",
        "--len_vis_input", str(VIS),
        "--img_size", str(IMG),
        "--max_seq_length", "24",
        "--bert_model", "test-tiny",
        "--vocab_size", str(len(vocab)),
    ])
    import logging

    server = serve_main.make_server(args, logging.getLogger("test-serve"))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address
    server.shutdown()


def _png_b64(seed: int) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (IMG, IMG), np.uint8),
                    "L").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(addr, payload: dict, path: str = "/generate"):
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_healthz(server_fixture):
    with urllib.request.urlopen(
            f"http://{server_fixture[0]}:{server_fixture[1]}/healthz",
            timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"
    assert body["batch_size"] == 2


def test_generate_concurrent_micro_batched(server_fixture):
    """3 concurrent requests through a batch-2 server: one full batch plus
    one padded short batch; every caller gets its own caption."""
    results = {}

    def call(i):
        results[i] = _post(server_fixture, {"image_b64": _png_b64(i)})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {0, 1, 2}
    for i, (status, body) in results.items():
        assert status == 200, (i, body)
        assert isinstance(body["caption"], str)


def test_generate_bad_request(server_fixture):
    import urllib.error

    try:
        status, body = _post(server_fixture, {"nope": 1})
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 400 and "error" in body


def test_reload_hot_swaps_weights(server_fixture, tmp_path_factory):
    """POST /reload swaps checkpoints without recompiling: captions for the
    same image must change once different weights are live, and a bad path
    must 404 while the old weights keep serving."""
    import urllib.error

    import jax
    import jax.numpy as jnp

    from medvill_tpu.core import checkpoint as ckpt_lib
    from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                         ImageEncoderConfig)
    from medvill_tpu.data.tokenization import build_vocab
    from medvill_tpu.train import finetune as ft

    addr = server_fixture
    img = _png_b64(99)
    status, before = _post(addr, {"image_b64": img})
    assert status == 200

    # a second checkpoint with different weights, same shapes
    d = tmp_path_factory.mktemp("serve_reload")
    vocab = build_vocab([f"word{i}" for i in range(40)])
    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=len(vocab))),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=VIS,
                                 encoder="full-fiber"),
        len_vis_input=VIS, max_seq_length=24, max_pred=3, img_size=IMG)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(41)},
        jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    ckpt_lib.save(str(d / "model_b"), 0,
                  {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})})

    status, body = _post(addr, {"model_recover_path": str(d / "model_b")},
                         path="/reload")
    assert status == 200 and body["status"] == "reloaded", body
    status, after = _post(addr, {"image_b64": img})
    assert status == 200
    # different random init -> different captions for the same image
    # (identical would mean the swap silently did not land)
    assert after["caption"] != before["caption"], (before, after)

    # bad reload path: 404, and the endpoint still serves
    try:
        status, body = _post(addr, {"model_recover_path": str(d / "nope")},
                             path="/reload")
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 404 and "error" in body
    status, again = _post(addr, {"image_b64": img})
    assert status == 200 and again["caption"] == after["caption"]


def test_metrics_endpoint(server_fixture):
    """GET /metrics: Prometheus text exposition with live counters.  Runs
    after the generate tests in this module, so requests/batches are > 0
    and the padded short batch from the 3-concurrent test is recorded."""
    _post(server_fixture, {"image_b64": _png_b64(7)})  # ensure >= 1 request
    with urllib.request.urlopen(
            f"http://{server_fixture[0]}:{server_fixture[1]}/metrics",
            timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    metrics = {}
    for line in text.splitlines():
        if line and not line.startswith("#"):
            name, val = line.rsplit(" ", 1)
            metrics[name] = float(val)
    assert metrics["medvill_serve_compiled_batch_size"] == 2
    assert metrics["medvill_serve_requests_total"] >= 1
    assert metrics["medvill_serve_batches_total"] >= 1
    assert metrics["medvill_serve_decode_seconds_total"] > 0
    assert metrics["medvill_serve_request_latency_seconds_total"] > 0
    assert metrics["medvill_serve_padded_rows_total"] >= 0
    # TYPE comments present for every series
    assert "# TYPE medvill_serve_requests_total counter" in text


def test_micro_batcher_graceful_drain():
    """close() rejects new submits with ServerClosing (503 at the handler),
    drain() waits for already-accepted requests to finish."""
    import time as _t

    def slow_run(x):
        _t.sleep(0.2)
        return [[1, 2]] * int(x.shape[0])

    b = serve_main.MicroBatcher(slow_run, batch_size=2, max_wait_ms=10)
    results = {}
    clients = [threading.Thread(
        target=lambda i=i: results.setdefault(
            i, b.submit(np.zeros((4, 4, 3), np.uint8))))
        for i in range(2)]
    for t in clients:
        t.start()
    _t.sleep(0.05)
    b.close()
    with pytest.raises(serve_main.ServerClosing):
        b.submit(np.zeros((4, 4, 3), np.uint8))
    assert b.drain(timeout=5.0), "drain timed out"
    for t in clients:
        t.join(timeout=5.0)
    assert set(results) == {0, 1}
    assert all(list(v) == [1, 2] for v in results.values())
    # drain also waits for HTTP handlers that haven't reached submit() yet
    b2 = serve_main.MicroBatcher(slow_run, batch_size=2, max_wait_ms=10)
    b2.enter_http()
    b2.close()
    assert not b2.drain(timeout=0.3)
    b2.exit_http()
    assert b2.drain(timeout=1.0)


def test_install_graceful_shutdown_wiring():
    """SIGTERM -> batcher.close() + threaded server.shutdown()."""
    import logging
    import signal as _signal

    calls = []

    class _FakeBatcher:
        def close(self):
            calls.append("close")

    class _FakeServer:
        batcher = _FakeBatcher()

        def shutdown(self):
            calls.append("shutdown")

    prev = _signal.getsignal(_signal.SIGTERM)
    try:
        serve_main.install_graceful_shutdown(
            _FakeServer(), logging.getLogger("t"))
        os.kill(os.getpid(), _signal.SIGTERM)
        deadline = time.monotonic() + 5.0
        while "shutdown" not in calls and time.monotonic() < deadline:
            time.sleep(0.01)
        assert calls[0] == "close" and "shutdown" in calls, calls
    finally:
        _signal.signal(_signal.SIGTERM, prev)
