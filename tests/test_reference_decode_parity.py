"""TOKEN-EXACT decode parity against the reference's own
``BertForSeq2SeqDecoder`` greedy loop.

Companion to test_reference_vlp_parity.py: load our exported finetune
checkpoint into the vendored decoder imported from /root/reference and
require the per-step argmax token ids to match our KV-cached
``greedy_decode`` exactly.  This cross-validates, against the reference's
real code, the equivalence our internal tests assert by construction:

- hidden-state decode cache + per-step K/V recompute over cat(history, new)
  (model.py:285-294, 1174-1236) == our true K/V cache,
- the decode-time position layout (CLS+img arange, text continuing at
  len_vis+2 — data_loader.py:499-505) == our hardcoded window positions,
- the s2s decode mask == our prefill/window biases,
- the reference greedy loop's gt-feeding quirk (model.py:1177-1189 replaces
  each committed token with gt[start_pos-258]) == our teacher_forcing mode.

The 258 in the reference is a HARDCODED ``len_vis_input(256)+2`` offset, so
this test must run at len_vis_input=256 (512px images, all 256 trunk fibers
via 'fully_use_cnn' — deterministic, no RNG coupling); the BERT itself stays
test-tiny so CPU time is bounded.
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
from medvill_tpu.models.decoder import DecodeSettings, greedy_decode  # noqa: E402
from medvill_tpu.train import finetune as ft  # noqa: E402
from tests.test_reference_vlp_parity import _import_vendored_model  # noqa: E402

B, HID, VOCAB, IMG, VIS = 2, 32, 32, 512, 256
T = 4                       # decoded text steps
A2 = VIS + 2                # [CLS] + 256 img + [SEP] = 258 (the hardcoded
                            # offset in model.py:1183 'start_pos-258')
MAXLEN = A2 + T
CLS, SEP, MASK, PAD = 2, 3, 4, 0


def _decode_inputs(rng):
    """The reference Preprocess4Seq2seqDecoder tensors
    (sc/data_loader.py:477-530) at this geometry, built literally."""
    input_ids = np.full((B, A2), 1, np.int64)   # [UNK] image placeholders
    input_ids[:, 0] = CLS
    input_ids[:, -1] = SEP
    segment_ids = np.concatenate([np.full((B, A2), 4, np.int64),
                                  np.full((B, T), 5, np.int64)], 1)
    position_ids = np.broadcast_to(np.arange(MAXLEN, dtype=np.int64),
                                   (B, MAXLEN)).copy()  # max_a_len == VIS:
    # the pad/restart branches of data_loader.py:499-505 collapse to arange
    mask = np.zeros((MAXLEN, MAXLEN), np.int64)
    mask[:, :A2] = 1                                      # all rows see img
    mask[A2:, A2:] = np.tril(np.ones((T, T), np.int64))   # text tril
    gt = rng.integers(5, VOCAB, (B, T)).astype(np.int64)
    image = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
    return input_ids, segment_ids, position_ids, \
        np.broadcast_to(mask, (B, MAXLEN, MAXLEN)).copy(), gt, image


def test_greedy_decode_matches_reference_token_exact():
    vendored = _import_vendored_model()

    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=VOCAB)),
        image=ImageEncoderConfig(img_size=IMG, num_image_embeds=VIS,
                                 encoder="full-fiber"),
        len_vis_input=VIS, max_len_b=T, max_seq_length=MAXLEN,
        max_pred=2, img_size=IMG)
    model = ft.build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, IMG, IMG, 3)),
        jnp.zeros((1, MAXLEN), jnp.int32), jnp.zeros((1, MAXLEN), jnp.int32),
        jnp.zeros((1, 1, MAXLEN, MAXLEN)),
        masked_pos=jnp.zeros((1, 2), jnp.int32), deterministic=True)
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    vcfg = vendored.BertConfig(
        vocab_size_or_config_json_file=VOCAB, hidden_size=HID,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        type_vocab_size=6, relax_projection=0, label_smoothing=0,
        max_position_embeddings=512)
    args = types.SimpleNamespace(
        img_encoding="fully_use_cnn", len_vis_input=VIS, img_hidden_sz=2048,
        hidden_size=HID, img_postion=True, new_segment_ids=True,
        max_position_embeddings=512, vocab_size=VOCAB)
    ref = vendored.BertForSeq2SeqDecoder(
        vcfg, args, mask_word_id=MASK, search_beam_size=1, eos_id=SEP,
        len_vis_input=VIS).eval()

    # the decoder recover path: finetune layout + 'bert.' prefix remap
    # (generation_decode.py:384-388) == our torch_remap('finetune_to_decoder')
    from medvill_tpu.core.checkpoint import torch_remap

    from tests.ref_support import to_torch

    sd = torch_export.export_vlp_state_dict(params, batch_stats)
    sd = torch_remap(sd, "finetune_to_decoder")
    tensors = to_torch(sd)
    result = ref.load_state_dict(tensors, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:  # shared-module aliases + unused NSP head
        assert k.startswith(("bert.img_embeddings.", "cls.seq_relationship")), k

    rng = np.random.default_rng(3)
    input_ids, segment_ids, position_ids, mask, gt, image = _decode_inputs(rng)
    with torch.no_grad():
        ref_ids, _, _ = ref(
            torch.as_tensor(image.transpose(0, 3, 1, 2)), None,
            torch.as_tensor(input_ids), torch.as_tensor(segment_ids),
            torch.as_tensor(position_ids), torch.as_tensor(mask),
            torch.as_tensor(gt), torch.device("cpu"))

    settings = DecodeSettings(max_txt_length=T, mask_word_id=MASK,
                              eos_id=-1,  # reference greedy has no EOS break
                              new_segment_ids=True)
    out_ids, _, _ = greedy_decode(
        model, {"params": params, "batch_stats": batch_stats},
        jnp.asarray(image), settings, CLS, SEP,
        gt_tokens=jnp.asarray(gt.astype(np.int32)), teacher_forcing=True)

    np.testing.assert_array_equal(np.asarray(out_ids),
                                  ref_ids.numpy().astype(np.int32))
