"""relax_projection MLM-head: task-specific projections selected per sample
(reference: sc/pytorch_pretrained_bert/model.py:435-496 — transform widens to
relax_projection*hidden, then ``view(B, L, R, -1)[arange(B), :, task_idx, :]``
selects one projection before the tied decoder)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from medvill_tpu.core.config import BertConfig
from medvill_tpu.models.heads import MLMHead

CFG = dataclasses.replace(
    BertConfig(vocab_size=11, hidden_size=4, num_hidden_layers=1,
               num_attention_heads=2, intermediate_size=8),
    relax_projection=3)
B, L, H, R, V = 2, 5, 4, 3, 11


def _init(head, hidden, emb, task_idx):
    return head.init(jax.random.PRNGKey(0), hidden, emb, task_idx=task_idx)


def test_matches_torch_view_select_transcription():
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32))
    task_idx = jnp.asarray([2, 0], jnp.int32)
    head = MLMHead(CFG)
    variables = _init(head, hidden, emb, task_idx)
    got = np.asarray(head.apply(variables, hidden, emb, task_idx=task_idx))
    assert got.shape == (B, L, V)

    # literal transcription of the reference select (model.py:480-484)
    p = variables["params"]
    w = np.asarray(p["transform_dense"]["kernel"])     # [H, R*H]
    b = np.asarray(p["transform_dense"]["bias"])
    x = np.asarray(hidden) @ w + b                      # [B, L, R*H]
    from scipy.special import erf
    x = 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))         # exact gelu
    g = np.asarray(p["transform_LayerNorm"]["scale"])
    bb = np.asarray(p["transform_LayerNorm"]["bias"])
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    x = (x - mu) / np.sqrt(var + 1e-5) * g + bb
    x = x.reshape(B, L, R, H)[np.arange(B), :, np.asarray(task_idx), :]
    want = x @ np.asarray(emb).T + np.asarray(p["decoder_bias"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_task_idx_changes_output_and_default_zero():
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32))
    head = MLMHead(CFG)
    variables = _init(head, hidden, emb, jnp.zeros((B,), jnp.int32))
    out0 = head.apply(variables, hidden, emb,
                      task_idx=jnp.zeros((B,), jnp.int32))
    out2 = head.apply(variables, hidden, emb,
                      task_idx=jnp.full((B,), 2, jnp.int32))
    assert not np.allclose(np.asarray(out0), np.asarray(out2))
    # None task_idx defaults to projection 0
    out_none = head.apply(variables, hidden, emb)
    np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out0))


def test_relax_disabled_is_plain_head():
    cfg = dataclasses.replace(CFG, relax_projection=0)
    rng = np.random.default_rng(2)
    hidden = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32))
    head = MLMHead(cfg)
    variables = head.init(jax.random.PRNGKey(0), hidden, emb)
    k = variables["params"]["transform_dense"]["kernel"]
    assert k.shape == (H, H)
    out = head.apply(variables, hidden, emb,
                     task_idx=jnp.ones((B,), jnp.int32))  # ignored
    assert out.shape == (B, L, V)
