"""END-TO-END parity against the reference's OWN code.

The strongest parity artifact in the suite: export our randomly-initialized
CXRBERT through ``core.torch_export``, load it into the actual reference
model imported from ``/root/reference`` (``models/cxrbert_origin.py::CXRBERT``
via the same runtime shims REFBENCH uses), run BOTH frameworks forward on the
same batch, and require the MLM and ITM logits to agree.  This
simultaneously proves:

- the exported state_dict layout is exactly what the reference consumes
  (key-level round-trip is tested in test_torch_export.py; this is the
  semantic check),
- the full model assembly — ResNet-50 trunk, shared-table image embeddings,
  position-0 CLS/SEP, joint encoder, tied MLM head, ITM head — is
  numerically equivalent end to end (the BASELINE "MLM/ITM loss parity"
  north star),
- and therefore a training run is transferable between the frameworks in
  either direction.

Determinism note: the reference's ImageEncoder_cnn random-samples pixel
fibers with ``torch.randperm(N)[:num]`` *sorted* inside forward
(models/image.py:63-68); with ``num_image_embeds == num_fibers`` the sorted
sample is the identity permutation on both sides, so no RNG coupling is
needed.
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
from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,  # noqa: E402
                                     MaskVariant, PretrainConfig)
from medvill_tpu.train import optim  # noqa: E402
from medvill_tpu.train.pretrain import init_state  # noqa: E402

B, SEQ_LEN, VOCAB, IMG, N_EMB, HID = 2, 7, 64, 64, 4, 32
L_TXT = SEQ_LEN + 1
TOTAL = SEQ_LEN + N_EMB + 3


def _load_reference_cxrbert():
    """Import the reference model with the REFBENCH runtime shims, at the
    test-tiny architecture (the from_pretrained shim returns our tiny
    config instead of fetching bert-base)."""
    # bench_ref_cpu reads sys.argv at import (its CLI batch/iters knobs);
    # shield it from pytest's argv
    argv, sys.argv = sys.argv, ["bench_ref_cpu"]
    try:
        import bench_ref_cpu
    finally:
        sys.argv = argv
    bench_ref_cpu._install_shims()
    import transformers.models.bert.modeling_bert as mbert

    from tests.ref_support import reference_on_path, tiny_bert_from_pretrained

    tiny = dict(hidden_size=HID, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, vocab_size=VOCAB,
                max_position_embeddings=512, hidden_act="gelu")
    config = mbert.BertConfig(**tiny)
    with reference_on_path(["/root/reference"]), \
            tiny_bert_from_pretrained(config):
        from models.cxrbert_origin import CXRBERT as RefCXRBERT

        args = types.SimpleNamespace(
            bert_model="bert-base-scratch", img_encoder="cnn",
            img_hidden_sz=2048, embedding_size=HID, hidden_size=HID,
            dropout_prob=0.1, img_postion=True, disturbing_mask=False,
            num_image_embeds=N_EMB, img_size=IMG, vocab_size=VOCAB,
            img_channel=3, seq_len=SEQ_LEN)
        return RefCXRBERT(config, args).eval()


# state_dict names load_state_dict may miss without harm: buffers modern
# transformers registers (position_ids/token_type_ids) and the aliases of
# SHARED modules (the reference's ImageBertEmbeddings reuses txt_embeddings'
# token_type/LayerNorm/position tables — loading the txt_embeddings.* name
# sets the shared tensor; MLM decoder.weight ties the word embeddings)
_OK_MISSING_SUFFIXES = ("position_ids", "token_type_ids")
_OK_MISSING_PREFIXES = ("enc.img_embeddings.token_type_embeddings",
                        "enc.img_embeddings.LayerNorm",
                        "enc.img_embeddings.position_embeddings")


def test_exported_checkpoint_drives_reference_model():
    ref = _load_reference_cxrbert()

    cfg = PretrainConfig(
        batch_size=B, seq_len=SEQ_LEN,
        bert=BertConfig.test_tiny(vocab_size=VOCAB),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=N_EMB))
    model, state = init_state(cfg, jax.random.PRNGKey(0), optim.adamw(1e-3))
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)

    from tests.ref_support import to_torch

    sd = torch_export.export_cxrbert_state_dict(params, batch_stats)
    tensors = to_torch(sd)
    result = ref.load_state_dict(tensors, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:
        assert k.endswith(_OK_MISSING_SUFFIXES) or \
            k.startswith(_OK_MISSING_PREFIXES), k
    # the tied decoder really is the word-embedding table after load
    assert ref.mlm.predictions.decoder.weight.data_ptr() == \
        ref.enc.txt_embeddings.word_embeddings.weight.data_ptr()

    rng = np.random.default_rng(0)
    cls_np = np.full((B, 1), 2, np.int64)
    sep_np = np.full((B, 1), 3, np.int64)
    txt_np = rng.integers(5, VOCAB, (B, L_TXT)).astype(np.int64)
    seg_np = np.ones((B, L_TXT), np.int64)
    img_np = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        ref_mlm, ref_itm = ref(
            torch.as_tensor(cls_np), torch.as_tensor(txt_np),
            torch.ones((B, TOTAL, TOTAL), dtype=torch.long),
            torch.as_tensor(seg_np),
            torch.as_tensor(img_np.transpose(0, 3, 1, 2)),
            torch.as_tensor(sep_np))

    mask_spec = jnp.asarray(
        np.stack([np.full(B, int(MaskVariant.FULL), np.int32),
                  np.full(B, L_TXT, np.int32)], -1))
    ours_mlm, ours_itm = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(cls_np.astype(np.int32)),
        jnp.asarray(txt_np.astype(np.int32)), mask_spec,
        jnp.asarray(seg_np.astype(np.int32)), jnp.asarray(img_np),
        jnp.asarray(sep_np.astype(np.int32)),
        pixel_indices=jnp.arange(N_EMB, dtype=jnp.int32),
        deterministic=True)

    np.testing.assert_allclose(np.asarray(ours_mlm), ref_mlm.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_itm), ref_itm.numpy(),
                               rtol=1e-3, atol=2e-4)

    # MLM/ITM losses (the BASELINE north-star parity statement): torch CE
    # on the reference logits vs our pretrain loss path on the same batch
    txt_labels = np.full((B, TOTAL), -100, np.int64)
    txt_labels[:, N_EMB + 2::2] = txt_np[:, ::2][:, :(TOTAL - N_EMB - 2 + 1)
                                                 // 2]
    is_aligned = rng.integers(0, 2, (B,)).astype(np.int64)
    ref_mlm_loss = torch.nn.CrossEntropyLoss(ignore_index=-100)(
        ref_mlm.transpose(1, 2), torch.as_tensor(txt_labels))
    ref_itm_loss = torch.nn.CrossEntropyLoss()(
        ref_itm, torch.as_tensor(is_aligned))

    import dataclasses

    from medvill_tpu.train.pretrain import pretrain_loss_and_metrics

    loss_cfg = dataclasses.replace(cfg, use_flash_attention=False)
    batch = dict(
        cls_tok=jnp.asarray(cls_np.astype(np.int32)),
        input_txt=jnp.asarray(txt_np.astype(np.int32)),
        txt_labels=jnp.asarray(txt_labels.astype(np.int32)),
        mask_spec=mask_spec,
        segment=jnp.asarray(seg_np.astype(np.int32)),
        image=jnp.asarray(img_np),
        is_aligned=jnp.asarray(is_aligned.astype(np.int32)),
        sep_tok=jnp.asarray(sep_np.astype(np.int32)),
    )
    _, (metrics, _) = pretrain_loss_and_metrics(
        model, state.params, state.batch_stats, batch,
        jax.random.PRNGKey(0), jnp.arange(N_EMB, dtype=jnp.int32),
        loss_cfg, train=False)
    np.testing.assert_allclose(float(metrics["mlm_loss"]),
                               float(ref_mlm_loss), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["itm_loss"]),
                               float(ref_itm_loss), rtol=2e-4)
