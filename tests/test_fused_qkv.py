"""Fused-QKV parameterization: with ``BertConfig.fused_qkv`` the attention
projections live as ONE [H, 3H] ``self/qkv`` parameter (a single gemm, no
per-step weight concat).  Locks (a) numerical equivalence with the split
query/key/value layout given the same weights, and (b) the checkpoint-import
fusion (torch q/k/v -> fused qkv) in load_hf_bert_into_joint."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.config import BertConfig
from medvill_tpu.models.bert import BertEncoder

def _cfg(fused):
    return dataclasses.replace(
        BertConfig.test_tiny(vocab_size=64), fused_qkv=fused,
        compute_dtype="float32", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)


def test_fused_matches_split():
    cfg_s, cfg_f = _cfg(False), _cfg(True)
    enc_s, enc_f = BertEncoder(cfg_s), BertEncoder(cfg_f)
    B, L = 2, 5
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg_s.hidden_size))
    bias = jnp.zeros((B, 1, L, L))
    ps = enc_s.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    pf_expected = enc_f.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    # carry the split weights into the fused layout
    pf = jax.tree_util.tree_map(np.asarray,
                                ckpt_lib.fuse_qkv_encoder(dict(ps)))
    assert jax.tree_util.tree_structure(pf) \
        == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, dict(pf_expected)))
    out_s = enc_s.apply({"params": ps}, hidden, bias)[0]
    out_f = enc_f.apply({"params": pf}, hidden, bias)[0]
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f),
                               rtol=1e-5, atol=1e-5)


def test_hf_import_fuses_qkv():
    cfg = _cfg(True)
    Hs = cfg.hidden_size
    rng = np.random.default_rng(0)
    sd = {}
    emb = "embeddings"
    sd[f"{emb}.word_embeddings.weight"] = rng.standard_normal((64, Hs))
    sd[f"{emb}.position_embeddings.weight"] = rng.standard_normal((16, Hs))
    sd[f"{emb}.token_type_embeddings.weight"] = rng.standard_normal((2, Hs))
    sd[f"{emb}.LayerNorm.weight"] = np.ones(Hs)
    sd[f"{emb}.LayerNorm.bias"] = np.zeros(Hs)
    for i in range(cfg.num_hidden_layers):
        lp = f"encoder.layer.{i}"
        for mod in ("attention.self.query", "attention.self.key",
                    "attention.self.value", "attention.output.dense",
                    "intermediate.dense", "output.dense"):
            fan_out = 4 * Hs if mod == "intermediate.dense" else Hs
            fan_in = 4 * Hs if mod == "output.dense" else Hs
            sd[f"{lp}.{mod}.weight"] = rng.standard_normal((fan_out, fan_in))
            sd[f"{lp}.{mod}.bias"] = rng.standard_normal(fan_out)
        for lnp in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[f"{lp}.{lnp}.weight"] = np.ones(Hs)
            sd[f"{lp}.{lnp}.bias"] = np.zeros(Hs)

    enc = BertEncoder(cfg)
    B, L = 2, 5
    hidden = jnp.zeros((B, L, Hs))
    bias = jnp.zeros((B, 1, L, L))
    pf = enc.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    # wrap with an embeddings subtree shaped like the joint-encoder target
    target = {
        "enc": {
            "embeddings": {
                "word_embeddings": {"embedding": np.zeros((64, Hs))},
                "position_embeddings": {"embedding": np.zeros((16, Hs))},
                "token_type_embeddings": {"embedding": np.zeros((2, Hs))},
                "LayerNorm": {"scale": np.ones(Hs), "bias": np.zeros(Hs)},
            },
            "encoder": dict(pf),
        }
    }
    out = ckpt_lib.load_hf_bert_into_joint(
        target, sd, num_layers=cfg.num_hidden_layers, enc_key="enc")
    l0 = out["enc"]["encoder"]["layer_0"]["self"]
    assert set(l0) == {"qkv"}
    np.testing.assert_array_equal(
        l0["qkv"]["kernel"][:, :Hs],
        np.asarray(sd["encoder.layer.0.attention.self.query.weight"]).T)
    np.testing.assert_array_equal(
        l0["qkv"]["kernel"][:, 2 * Hs:],
        np.asarray(sd["encoder.layer.0.attention.self.value.weight"]).T)
    np.testing.assert_array_equal(
        l0["qkv"]["bias"][Hs:2 * Hs],
        np.asarray(sd["encoder.layer.0.attention.self.key.bias"]))
