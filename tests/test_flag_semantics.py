"""Behavior tests for the round-3 CLI flag wirings: config.json overlay,
single-label classification mode, epoch-gated drop-worst, decode
min_len/forbid_ignore_word, and truncation policy flags."""
import json
import random

import numpy as np
import pytest

from medvill_tpu.core.config import BertConfig, FinetuneConfig
from medvill_tpu.data import sampling as S


def test_bertconfig_from_reference_json(tmp_path):
    # the dict shape the vendored BertConfig.to_json_string writes
    # (reference model.py:106-199)
    cfgfile = tmp_path / "config.json"
    cfgfile.write_text(json.dumps({
        "vocab_size": 28996, "hidden_size": 512, "num_hidden_layers": 4,
        "num_attention_heads": 8, "intermediate_size": 2048,
        "max_position_embeddings": 512, "type_vocab_size": 6,
        "relax_projection": 4,
        # training-state keys with no dataclass equivalent — ignored
        "task_idx": 3, "fp32_embedding": False, "label_smoothing": 0.1,
    }))
    cfg = BertConfig.from_reference_json(str(cfgfile))
    assert cfg.vocab_size == 28996
    assert cfg.hidden_size == 512
    assert cfg.num_hidden_layers == 4
    assert cfg.relax_projection == 4
    assert cfg.type_vocab_size == 6
    # base fields not in the json keep their values
    base = BertConfig.vlp()
    overlay = BertConfig.from_reference_json(str(cfgfile), base=base)
    assert overlay.layer_norm_eps == base.layer_norm_eps


def test_classification_dataset_single_label():
    from medvill_tpu.data.classification import ClassificationDataset

    class Tok:
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "a": 4}

        def tokenize(self, text):
            return text.split()

    labels = ["Cardiomegaly", "Edema", "Others"]
    records = [dict(id="0", text="a a", label="Edema", img=None)]
    ds = ClassificationDataset(records, Tok(), labels, max_seq_len=12,
                               num_image_embeds=2, img_size=16,
                               task_type="classification")
    sample = ds[0]
    # reference dataset.py:62-64: class index, not multi-hot
    assert sample["label"].shape == ()
    assert int(sample["label"]) == 1
    ds_ml = ClassificationDataset(records, Tok(), labels, max_seq_len=12,
                                  num_image_embeds=2, img_size=16)
    assert ds_ml[0]["label"].tolist() == [0.0, 1.0, 0.0]


def test_classification_evaluate_acc():
    from medvill_tpu.train.classify import evaluate

    logits = np.array([[2.0, -1.0, 0.0], [0.0, 3.0, 1.0],
                       [1.0, 0.0, 5.0], [4.0, 0.0, 1.0]], np.float32)
    labels = np.array([0, 1, 0, 2], np.int32)

    def fake_eval_step(state, batch):
        return logits[batch["i"]]

    batches = [dict(i=np.array([0, 1]), label=labels[:2]),
               dict(i=np.array([2, 3]), label=labels[2:])]
    metrics, _, _ = evaluate(fake_eval_step, None, batches,
                             task_type="classification")
    assert metrics["acc"] == pytest.approx(0.5)  # hits: idx 0, 1


def test_drop_worst_epoch_gate():
    from medvill_tpu.train.finetune import drop_worst_ratio_for_epoch

    cfg = FinetuneConfig(max_drop_worst_ratio=0.2, drop_after=6)
    # reference 1-based gate: i_epoch > drop_after (finetune.py:440)
    assert drop_worst_ratio_for_epoch(cfg, 0) == 0.0    # i_epoch 1
    assert drop_worst_ratio_for_epoch(cfg, 5) == 0.0    # i_epoch 6
    assert drop_worst_ratio_for_epoch(cfg, 6) == 0.2    # i_epoch 7
    off = FinetuneConfig()  # reference defaults: ratio 0 -> never drops
    assert drop_worst_ratio_for_epoch(off, 100) == 0.0


def test_forbid_ignore_ids_from_words():
    from medvill_tpu.cli.decode_main import forbid_ignore_ids_from_words

    vocab = {"[UNK]": 1, "[SEP]": 3, ".": 7, "the": 9}
    assert forbid_ignore_ids_from_words(None, vocab) == ()
    assert forbid_ignore_ids_from_words(".|the", vocab) == (7, 9)
    # '[x]' forms are uppercased (generation_decode.py:354-356)
    assert forbid_ignore_ids_from_words("[sep]", vocab) == (3,)
    # unknown words map to [UNK]
    assert forbid_ignore_ids_from_words("zzz", vocab) == (1,)


def test_decode_parser_reference_names():
    from medvill_tpu.cli.decode_main import build_parser

    p = build_parser()
    # reference spelling --max_txt_length and the legacy alias both land in
    # the same dest
    a = p.parse_args(["--vocab_file", "v", "--max_txt_length", "7"])
    assert a.max_txt_length == 7
    b = p.parse_args(["--vocab_file", "v", "--max_tgt_length", "9"])
    assert b.max_txt_length == 9
    c = p.parse_args(["--vocab_file", "v", "--min_len", "4",
                      "--forbid_ignore_word", ".|[SEP]"])
    assert c.min_len == 4 and c.forbid_ignore_word == ".|[SEP]"
    # max_seq_length defaults to computed (generation_decode.py:328)
    assert a.max_seq_length is None


def test_truncation_policy_flags():
    # always_truncate_tail=True: deterministic tail pops, no RNG draws
    class ExplodingRng:
        def random(self):
            raise AssertionError("rng consulted despite truncate_tail")

    a = ["[UNK]"] * 4
    b = [f"t{i}" for i in range(10)]
    S.truncate_tokens_pair(a, b, max_len=4 + 6, max_len_b=6,
                           trunc_seg="b", always_truncate_tail=True,
                           rng=ExplodingRng())
    assert b == ["t0", "t1", "t2", "t3", "t4", "t5"]
    assert len(a) == 4

    # trunc_seg='a' drains segment a when no per-segment cap is exceeded
    a2 = [f"a{i}" for i in range(6)]
    b2 = [f"b{i}" for i in range(4)]
    S.truncate_tokens_pair(a2, b2, max_len=8, trunc_seg="a",
                           always_truncate_tail=True, rng=random.Random(0))
    assert len(a2) == 4 and len(b2) == 4


def test_img_channel_is_a_data_layer_flag():
    """img_channel=1 means grayscale SOURCE files expanded to 3 channels at
    load (reference full_dset_retrieval.py:174-176 Grayscale(3)); the model
    stem must stay 3-channel so init matches the loader's batches."""
    import jax

    from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                         PretrainConfig)
    from medvill_tpu.train.pretrain import init_state

    cfg = PretrainConfig(
        seq_len=7, bert=BertConfig.test_tiny(vocab_size=32),
        image=ImageEncoderConfig(num_image_embeds=3, img_size=32,
                                 img_channel=1))
    _, state = init_state(cfg, jax.random.PRNGKey(0))
    kernel = state.params["enc"]["img_encoder"]["conv1"]["kernel"]
    assert kernel.shape[-2] == 3


def test_finetune_config_from_args_new_flags(tmp_path):
    from medvill_tpu.cli.finetune_main import build_parser, config_from_args

    cfgfile = tmp_path / "config.json"
    cfgfile.write_text(json.dumps({"num_hidden_layers": 2}))
    args = build_parser().parse_args([
        "--src_file", "s.jsonl", "--vocab_file", "v.txt",
        "--max_drop_worst_ratio", "0.2", "--drop_after", "3",
        "--always_truncate_tail", "--trunc_seg", "a",
        "--sche_mode", "warmup_cosine", "--drop_prob", "0.2",
        "--config_path", str(cfgfile),
    ])
    cfg = config_from_args(args)
    assert cfg.max_drop_worst_ratio == 0.2 and cfg.drop_after == 3
    assert cfg.always_truncate_tail and cfg.trunc_seg == "a"
    assert cfg.sche_mode == "warmup_cosine"
    # --drop_prob sets the model dropout rates (model.py:620-623)
    assert cfg.bert.hidden_dropout_prob == 0.2
    assert cfg.bert.attention_probs_dropout_prob == 0.2
    # config.json overlay reached the BertConfig
    assert cfg.bert.num_hidden_layers == 2
