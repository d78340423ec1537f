"""E2E parity of the MMBT classification assembly against the reference's
own code (Downstream_task/Classification/mmbt/models/mmbt.py).

Same protocol as the pretrain/finetune/decode parity tests: export our
randomly-initialized MultimodalBertClf through ``core.torch_export``, load
it into the reference's actual model, run both forwards on one batch, and
require the classification logits to agree.

Reference EXECUTED behavior reproduced (not the dead code): its
ImageEncoder's adaptive pool is built but never applied — forward returns
ALL trunk fibers (mmbt/models/image.py:42-56) — so at img 64 the 2x2=4
fibers equal num_image_embeds=4 and the assembly is deterministic; the
encoder's inner ``enc.clf`` Linear is constructed but unused
(mmbt.py:65,102-114: only the outer ``clf`` runs).
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
from medvill_tpu.core.config import (BertConfig, ClassificationConfig,  # noqa: E402
                                     ImageEncoderConfig)
from medvill_tpu.train import classify  # noqa: E402

B, HID, VOCAB, IMG, N_EMB, N_CLS = 2, 32, 64, 64, 4, 3
TXT = 10
CLS, SEP = 2, 3


def _load_reference_mmbt():
    from tests.ref_support import reference_on_path, tiny_bert_from_pretrained
    from tests.test_reference_vlp_parity import _import_vendored_model

    _import_vendored_model()  # installs the torchvision/transformers shims
    import transformers.models.bert.modeling_bert as mbert

    tiny = dict(hidden_size=HID, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, vocab_size=VOCAB,
                max_position_embeddings=512, hidden_act="gelu")
    with reference_on_path(
            ["/root/reference/Downstream_task/Classification/mmbt"]), \
            tiny_bert_from_pretrained(mbert.BertConfig(**tiny)):
        from models.mmbt import MultimodalBertClf as RefClf

        args = types.SimpleNamespace(
            init_model="bert-base-scratch", img_hidden_sz=2048, hidden_sz=HID,
            dropout=0.1, num_image_embeds=N_EMB, img_embed_pool_type="avg",
            n_classes=N_CLS,
            vocab=types.SimpleNamespace(stoi={"[CLS]": CLS, "[SEP]": SEP}))
        return RefClf(args).eval()


_OK_MISSING_PREFIXES = (
    # shared-module aliases of txt_embeddings tables
    "enc.img_embeddings.token_type_embeddings",
    "enc.img_embeddings.word_embeddings",
    "enc.img_embeddings.LayerNorm",
    "enc.img_embeddings.position_embeddings",
    # the encoder's unused inner Linear (mmbt.py:65)
    "enc.clf",
)
_OK_MISSING_SUFFIXES = ("position_ids", "token_type_ids")


def test_exported_mmbt_checkpoint_drives_reference_model():
    ref = _load_reference_mmbt()

    cfg = ClassificationConfig(
        bert=BertConfig.test_tiny(vocab_size=VOCAB),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=N_EMB,
                                 encoder="full-fiber"),
        num_image_embeds=N_EMB, max_seq_len=N_EMB + 2 + TXT, img_size=IMG,
        batch_size=B, labels=tuple(f"c{i}" for i in range(N_CLS)))
    model = classify.build_model(cfg, N_CLS)
    rng = np.random.default_rng(0)
    txt_np = rng.integers(5, VOCAB, (B, TXT)).astype(np.int64)
    txt_len = np.full((B,), TXT - 2, np.int32)  # 2 trailing pads
    txt_np[:, TXT - 2:] = 0
    segment_np = np.zeros((B, TXT), np.int64)
    img_np = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(txt_np.astype(np.int32)), jnp.asarray(txt_len),
        jnp.asarray(segment_np.astype(np.int32)), jnp.asarray(img_np),
        CLS, SEP)
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    from tests.ref_support import to_torch

    sd = torch_export.export_mmbt_state_dict(params, batch_stats)
    assert torch_export.detect_kind(params) == "mmbt"
    tensors = to_torch(sd)
    result = ref.load_state_dict(tensors, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:
        assert k.startswith(_OK_MISSING_PREFIXES) or \
            k.endswith(_OK_MISSING_SUFFIXES), k

    # reference takes the dataloader's 1-D text mask (1 for valid positions)
    mask_np = (np.arange(TXT)[None, :] < txt_len[:, None]).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref(torch.as_tensor(txt_np),
                         torch.as_tensor(mask_np),
                         torch.as_tensor(segment_np),
                         torch.as_tensor(img_np.transpose(0, 3, 1, 2)))

    ours = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(txt_np.astype(np.int32)), jnp.asarray(txt_len),
        jnp.asarray(segment_np.astype(np.int32)), jnp.asarray(img_np),
        CLS, SEP, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_logits.numpy(),
                               rtol=1e-3, atol=2e-4)
