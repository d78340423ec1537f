"""E2E parity of the CNN_BERT late-fusion baseline against the reference's
own code (CNN_BERT/main_cnn_bert.py).

Completes the parity-vs-reference-code quartet (pretrain CXRBERT, VLP
finetune, seq2seq decode, MMBT): export our randomly-initialized CNNBert
through ``core.torch_export``, load it into the reference's actual CNN_BERT
model, and require the 2-class alignment logits to agree on one batch.
The reference concatenates [img_cls, txt_cls] (main_cnn_bert.py:190) — the
order our fc kernel uses too.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medvill_tpu.core import torch_export  # noqa: E402
from medvill_tpu.core.config import BertConfig  # noqa: E402
from medvill_tpu.models.cnn_bert import CNNBert  # noqa: E402

B, HID, VOCAB, IMG, TXT = 2, 32, 64, 64, 10


def _load_reference_cnn_bert():
    from tests.ref_support import reference_on_path, tiny_bert_from_pretrained
    from tests.test_reference_vlp_parity import _import_vendored_model

    _import_vendored_model()  # torchvision/transformers/wandb shims
    import transformers.models.bert.modeling_bert as mbert

    tiny = dict(hidden_size=HID, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, vocab_size=VOCAB,
                max_position_embeddings=512, hidden_act="gelu")
    # modern transformers keeps AutoConfig in configuration_auto, not
    # modeling_auto (the v3-era location main_cnn_bert.py:27 imports from)
    import transformers.models.auto.modeling_auto as mauto

    if not hasattr(mauto, "AutoConfig"):
        mauto.AutoConfig = transformers.AutoConfig
    cfg = mbert.BertConfig(**tiny)
    # the reference casts its additive mask to fp16 unconditionally
    # (main_cnn_bert.py:169) — modern torch SDPA rejects a half mask with a
    # float query, so run HF's eager attention (what transformers v3, the
    # reference's era, always did: mask ADDED to the scores)
    cfg._attn_implementation = "eager"
    with reference_on_path(
            ["/root/reference/CNN_BERT", "/root/reference"],
            purge=("main_cnn_bert", "data", "models")), \
            tiny_bert_from_pretrained(cfg):
        import main_cnn_bert as ref_mod

        args = types.SimpleNamespace(
            bert_model="bert-base-scratch", img_hidden_sz=2048,
            hidden_size=HID, vocab_size=VOCAB)
        return ref_mod.CNN_BERT(cfg, args).eval()


def test_exported_cnn_bert_checkpoint_drives_reference_model():
    ref = _load_reference_cnn_bert()

    model = CNNBert(BertConfig.test_tiny(vocab_size=VOCAB))
    rng = np.random.default_rng(0)
    txt_np = rng.integers(5, VOCAB, (B, TXT)).astype(np.int64)
    txt_len = np.full((B,), TXT - 2, np.int32)
    txt_np[:, TXT - 2:] = 0
    segment_np = np.zeros((B, TXT), np.int64)
    img_np = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(txt_np.astype(np.int32)), jnp.asarray(txt_len),
        jnp.asarray(segment_np.astype(np.int32)), jnp.asarray(img_np))
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    from tests.ref_support import to_torch

    sd = torch_export.export_cnn_bert_state_dict(params, batch_stats)
    assert torch_export.detect_kind(params) == "cnn_bert"
    tensors = to_torch(sd)
    result = ref.load_state_dict(tensors, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:  # HF buffer names only
        assert k.endswith(("position_ids", "token_type_ids")), k

    mask_np = (np.arange(TXT)[None, :] < txt_len[:, None]).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref(torch.as_tensor(txt_np), torch.as_tensor(mask_np),
                         torch.as_tensor(segment_np),
                         torch.as_tensor(img_np.transpose(0, 3, 1, 2)))

    ours = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(txt_np.astype(np.int32)), jnp.asarray(txt_len),
        jnp.asarray(segment_np.astype(np.int32)), jnp.asarray(img_np),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_logits.numpy(),
                               rtol=1e-3, atol=2e-4)
