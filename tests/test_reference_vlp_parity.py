"""E2E parity of the FINETUNE (VLP/UniLM) stack against the reference's own
vendored model.

Companion to test_reference_e2e_parity.py (which covers the pretrain
CXRBERT): export our randomly-initialized VLPForPreTraining through
``core.torch_export``, load it into the actual
``sc/pytorch_pretrained_bert/model.py::BertForPreTrainingLossMask`` imported
from /root/reference, and require the report-generation masked-LM loss to
agree on the same batch + the same S2S decode mask.  Proves the finetune
checkpoint layout, the vendored-BERT semantics (LN eps 1e-5, vis_pe position
embeddings, CLS/SEP-from-input-ids image segment), the gathered-MLM head,
and the drop-worst loss normalization are all equivalent end to end.

Determinism: args.img_encoding='fully_use_cnn' (pixel_full_sampling) returns
ALL trunk fibers with arange positions — no RNG on either side; both models
run eval/deterministic so dropout is off.
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
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,  # noqa: E402
                                     ImageEncoderConfig)
from medvill_tpu.data.masks import Seq2seqMaskMode, seq2seq_dense_mask  # noqa: E402
from medvill_tpu.train import finetune as ft  # noqa: E402
from medvill_tpu.train.losses import (cross_entropy_per_example,  # noqa: E402
                                      drop_worst_normalize)

B, HID, VOCAB, IMG, VIS = 2, 32, 32, 64, 4
MAX_LEN = 24
MAX_PRED = 3


def _import_vendored_model():
    """Import the reference's vendored BERT stack with the REFBENCH shims
    plus the extra stubs its module-scope imports need (torchvision
    transforms, boto3/botocore pulled in by .file_utils)."""
    argv, sys.argv = sys.argv, ["bench_ref_cpu"]
    try:
        import bench_ref_cpu
    finally:
        sys.argv = argv
    bench_ref_cpu._install_shims()

    tv = sys.modules["torchvision"]
    if "torchvision.transforms" not in sys.modules:
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToTensor = lambda *a, **k: (lambda x: x)
        tv.transforms = tvt
        sys.modules["torchvision.transforms"] = tvt
    for name in ("boto3", "botocore", "botocore.exceptions"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            if name == "botocore.exceptions":
                stub.ClientError = Exception
            sys.modules[name] = stub
    sys.modules["botocore"].exceptions = sys.modules["botocore.exceptions"]
    if "torch._six" not in sys.modules:
        # removed in modern torch; the vendored optimization.py (imported by
        # the package __init__) wants container_abcs
        import collections.abc

        six = types.ModuleType("torch._six")
        six.container_abcs = collections.abc
        six.inf = float("inf")
        sys.modules["torch._six"] = six

    from tests.ref_support import reference_on_path

    base = "/root/reference/Downstream_task/report_generation_and_vqa"
    # purge=(): 'sc' is an unambiguous name — keep it cached across parity
    # tests; only the sys.path prepend is scoped
    with reference_on_path([base], purge=()):
        import sc.pytorch_pretrained_bert.model as vendored

    return vendored


# allowed-missing on load_state_dict: tensors the reference model owns but a
# finetune checkpoint doesn't need to carry — shared-module aliases (the
# vendored ImageBertEmbeddings reuses txt_embeddings' tables; the tied MLM
# decoder is the word-embedding table) and the unused NSP head
_OK_MISSING_PREFIXES = ("img_embeddings.token_type_embeddings",
                        "img_embeddings.word_embeddings",
                        "img_embeddings.LayerNorm",
                        "img_embeddings.position_embeddings",
                        "cls.seq_relationship")


def test_exported_finetune_checkpoint_drives_vendored_model():
    vendored = _import_vendored_model()
    RefVLP, VendoredCfg = (vendored.BertForPreTrainingLossMask,
                           vendored.BertConfig)

    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=VOCAB)),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=VIS,
                                 encoder="full-fiber"),
        len_vis_input=VIS, max_len_b=10, max_seq_length=MAX_LEN,
        max_pred=MAX_PRED, img_size=IMG, label_smoothing=0.0)
    model = ft.build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, IMG, IMG, 3)),
        jnp.zeros((2, MAX_LEN), jnp.int32), jnp.zeros((2, MAX_LEN), jnp.int32),
        jnp.zeros((2, 1, MAX_LEN, MAX_LEN)),
        masked_pos=jnp.zeros((2, MAX_PRED), jnp.int32), deterministic=True)
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    vcfg = VendoredCfg(
        vocab_size_or_config_json_file=VOCAB, hidden_size=HID,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        type_vocab_size=6, relax_projection=0, label_smoothing=0,
        max_position_embeddings=512)
    args = types.SimpleNamespace(
        img_encoding="fully_use_cnn", len_vis_input=VIS, img_hidden_sz=2048,
        hidden_size=HID, img_postion=True, max_position_embeddings=512,
        vocab_size=VOCAB)
    ref = RefVLP(vcfg, args, len_vis_input=VIS, tasks="img2txt").eval()

    from tests.ref_support import to_torch

    sd = torch_export.export_vlp_state_dict(params, batch_stats)
    tensors = to_torch(sd)
    result = ref.load_state_dict(tensors, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:
        assert k.startswith(_OK_MISSING_PREFIXES), k
    assert ref.cls.predictions.decoder.weight.data_ptr() == \
        ref.txt_embeddings.word_embeddings.weight.data_ptr()

    # one batch: [CLS] img(VIS) [SEP] txt(10) [SEP] + pad to MAX_LEN,
    # segments 4/5 (new_segment_ids s2s), S2S decode mask with real length
    # n_tokens < MAX_LEN so the padding quirks are exercised
    rng = np.random.default_rng(0)
    n_tokens = 1 + VIS + 1 + 10 + 1
    input_ids = np.zeros((B, MAX_LEN), np.int64)
    input_ids[:, 0] = 2                       # CLS
    input_ids[:, 1:VIS + 1] = 1               # [UNK] image placeholders
    input_ids[:, VIS + 1] = 3                 # SEP
    input_ids[:, VIS + 2:n_tokens] = rng.integers(5, VOCAB, (B, 11))
    input_ids[:, n_tokens - 1] = 3            # final SEP
    segment_ids = np.concatenate(
        [np.full((B, VIS + 2), 4, np.int64),
         np.full((B, MAX_LEN - VIS - 2), 5, np.int64)], 1)
    dense = seq2seq_dense_mask(Seq2seqMaskMode.S2S, n_tokens, VIS, MAX_LEN)
    mask_np = np.broadcast_to(dense, (B, MAX_LEN, MAX_LEN)).copy()
    masked_pos = np.stack([
        rng.choice(np.arange(VIS + 2, n_tokens - 1), MAX_PRED, replace=False)
        for _ in range(B)]).astype(np.int64)
    masked_ids = rng.integers(5, VOCAB, (B, MAX_PRED)).astype(np.int64)
    masked_weights = np.ones((B, MAX_PRED), np.float32)
    masked_weights[1, -1] = 0.0  # exercise the weight normalization
    image = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        ref_loss, _ = ref(
            torch.as_tensor(image.transpose(0, 3, 1, 2)), None,
            torch.as_tensor(input_ids), torch.as_tensor(segment_ids),
            torch.as_tensor(mask_np.astype(np.int64)),
            masked_lm_labels=torch.as_tensor(masked_ids),
            masked_pos=torch.as_tensor(masked_pos),
            masked_weights=torch.as_tensor(masked_weights),
            task_idx=None, drop_worst_ratio=0.0)

    bias = jnp.asarray(((1.0 - mask_np) * -10000.0)[:, None].astype(
        np.float32))
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(image),
        jnp.asarray(input_ids.astype(np.int32)),
        jnp.asarray(segment_ids.astype(np.int32)), bias,
        masked_pos=jnp.asarray(masked_pos.astype(np.int32)),
        deterministic=True)
    per_pos = cross_entropy_per_example(
        logits, jnp.asarray(masked_ids.astype(np.int32)))
    ours_loss = drop_worst_normalize(per_pos,
                                     jnp.asarray(masked_weights), 0.0)
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=5e-4)
