"""CNN_BERT baseline, lang_utils fallback, file_utils, logging, seed."""
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvill_tpu.core.config import BertConfig


def test_cnn_bert_forward():
    from medvill_tpu.models.cnn_bert import CNNBert

    cfg = BertConfig.test_tiny(vocab_size=64)
    model = CNNBert(cfg, n_classes=2)
    B, T = 2, 10
    rng = np.random.default_rng(0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, T), jnp.int32), jnp.full((B,), 5, jnp.int32),
        jnp.ones((B, T), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32)))
    out = model.apply(
        variables, jnp.zeros((B, T), jnp.int32),
        jnp.full((B,), 5, jnp.int32), jnp.ones((B, T), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32)))
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_language_eval_fallback():
    from medvill_tpu.eval.lang_utils import language_eval

    out = language_eval([{"image_id": 1, "caption": "a b",
                          "gt_caption": "a b"}])
    assert out["Bleu_1"] == pytest.approx(1.0)


def test_cached_path_local_and_missing(tmp_path):
    from medvill_tpu.utils.file_utils import cached_path

    f = tmp_path / "x.txt"
    f.write_text("hi")
    assert cached_path(str(f)) == str(f)
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.txt"))
    with pytest.raises(FileNotFoundError):
        cached_path("https://example.com/model.bin",
                    cache_dir=str(tmp_path))


def test_cached_path_url_cache_hit(tmp_path):
    import hashlib
    from medvill_tpu.utils.file_utils import cached_path, url_to_filename

    url = "https://example.com/vocab.txt"
    name = url_to_filename(url)
    (tmp_path / name).write_text("vocab")
    assert cached_path(url, cache_dir=str(tmp_path)) == str(tmp_path / name)


def test_metric_logger_jsonl(tmp_path):
    from medvill_tpu.utils.logging import MetricLogger

    log = MetricLogger(str(tmp_path), use_wandb=False)
    log.log({"loss": 1.5, "acc": 0.5}, step=3)
    import json

    rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
    assert rec["loss"] == 1.5 and rec["step"] == 3


def test_numpy_seed_scoped():
    from medvill_tpu.utils.seed import numpy_seed

    np.random.seed(7)
    before = np.random.random()
    np.random.seed(7)
    with numpy_seed(0):
        inner1 = np.random.random()
    outer = np.random.random()
    with numpy_seed(0):
        inner2 = np.random.random()
    assert inner1 == inner2       # deterministic inside
    assert outer == before        # outer stream unaffected


def test_create_logger(tmp_path, capsys):
    from medvill_tpu.utils.logging import create_logger

    class A:
        x = 1

    logger = create_logger(str(tmp_path / "log.txt"), args=A())
    logger.info("hello")
    assert "hello" in (tmp_path / "log.txt").read_text()


def test_drain_metrics_mixed_shapes():
    """drain_metrics flattens mixed scalar / [k]-vector device entries to
    host floats, preserving every value once (one D2H transfer per shape
    group — the epoch-end drain for on-device metric accumulation)."""
    import jax.numpy as jnp

    from medvill_tpu.utils.logging import drain_metrics

    vals = [jnp.float32(1.0), jnp.array([2.0, 3.0]), jnp.float32(4.0),
            jnp.array([5.0, 6.0]), 7.0]
    out = drain_metrics(vals)
    assert sorted(out) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    assert all(isinstance(x, float) for x in out)
    assert drain_metrics([]) == []
