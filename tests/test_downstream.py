"""Downstream-task smoke + semantics: classification, retrieval, finetune,
VQA — tiny configs, single device (SURVEY.md §4 e2e smoke)."""
import dataclasses
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core.config import (BertConfig, ClassificationConfig,
                                     FinetuneConfig, ImageEncoderConfig,
                                     RetrievalConfig)
from medvill_tpu.data.pretrain import BatchLoader
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab
from medvill_tpu.train.pretrain import TrainState


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer(build_vocab([f"word{i}" for i in range(50)]))


TINY_IMG = ImageEncoderConfig(img_size=64, num_image_embeds=4,
                              encoder="full-fiber")


def rand_img_loader(size=64):
    rng = np.random.default_rng(0)
    return lambda p: rng.standard_normal((size, size, 3)).astype(np.float32)


def test_classification_pipeline_and_step(tok):
    from medvill_tpu.data.classification import (ClassificationDataset,
                                                 get_labels_and_frequencies,
                                                 pos_weights,
                                                 synthetic_clf_records)
    from medvill_tpu.train import classify

    labels = ["'A'", "'B'", "'C'"]
    recs = synthetic_clf_records(8, labels)
    got_labels, freqs = get_labels_and_frequencies(recs)
    assert set(got_labels) <= set(labels)
    cfg = ClassificationConfig(
        bert=BertConfig.test_tiny(vocab_size=64), image=TINY_IMG,
        num_image_embeds=4, max_seq_len=16, img_size=64, batch_size=4,
        labels=tuple(got_labels))
    ds = ClassificationDataset(recs, tok, got_labels, cfg.max_seq_len,
                               cfg.num_image_embeds, cfg.img_size,
                               image_loader=rand_img_loader())
    batch = next(iter(BatchLoader(ds, 4, shuffle=False)))
    assert batch["input_txt"].shape == (4, 12)
    assert batch["label"].shape == (4, len(got_labels))

    model = classify.build_model(cfg, len(got_labels))
    cls_id, sep_id = tok.vocab["[CLS]"], tok.vocab["[SEP]"]
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["input_txt"]),
                           jnp.asarray(batch["txt_len"]),
                           jnp.asarray(batch["segment"]),
                           jnp.asarray(batch["image"]), cls_id, sep_id)
    tx = classify.make_tx(cfg, t_total=10)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    pw = pos_weights(freqs, got_labels, len(ds))
    step = jax.jit(classify.make_train_step(model, tx, cfg, 10, pw, cls_id,
                                            sep_id))
    b = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = []
    for _ in range(3):
        state, loss = step(state, b, jax.random.PRNGKey(1),
                           jnp.asarray(1.0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    eval_step = jax.jit(classify.make_eval_step(model, cls_id, sep_id,
                                                cfg=cfg))
    metrics, logits, lab = classify.evaluate(eval_step, state, [batch])
    assert "micro_f1" in metrics and logits.shape == (4, len(got_labels))


def test_plateau_scheduler():
    from medvill_tpu.train.classify import PlateauScheduler

    s = PlateauScheduler(factor=0.5, patience=1)
    assert s.step(0.5) == 1.0     # improvement
    assert s.step(0.4) == 1.0     # 1 bad epoch (<= patience)
    assert s.step(0.4) == 0.5     # 2nd bad -> decay
    assert s.step(0.9) == 0.5     # improvement keeps scale


def test_retrieval_pair_dataset_and_step(tok):
    from medvill_tpu.data.retrieval import (CXRRetrievalDataset,
                                            collate_pairs,
                                            synthetic_retrieval_records)
    from medvill_tpu.train import optim, retrieve

    cfg = RetrievalConfig(
        bert=BertConfig.test_tiny(vocab_size=64), image=TINY_IMG,
        seq_len=7, num_image_embeds=4, img_size=64, batch_size=4)
    recs = synthetic_retrieval_records(12)
    ds = CXRRetrievalDataset(recs, tok, cfg, is_train=True, seed=0,
                             image_loader=rand_img_loader())
    samples = [ds[i] for i in range(4)]
    batch = collate_pairs(samples)
    # pos first then neg along batch (full_dset_retrieval.py:357-380)
    assert batch["is_aligned"].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]

    model = retrieve.build_model(cfg)
    from medvill_tpu.core.config import PretrainConfig
    from medvill_tpu.train.pretrain import init_state

    pcfg = PretrainConfig(seq_len=cfg.seq_len, bert=cfg.bert,
                          image=cfg.image, lr=1e-3)
    tx = optim.adamw(1e-3)
    _, state = init_state(pcfg, jax.random.PRNGKey(0), tx)
    step = jax.jit(retrieve.make_train_step(model, tx, cfg))
    b = jax.tree_util.tree_map(jnp.asarray, batch)
    state, m = step(state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["acc"]) <= 1.0

    # eval scoring path
    eval_recs = synthetic_retrieval_records(8, eval_pool=4)
    eval_ds = CXRRetrievalDataset(eval_recs, tok, cfg, is_train=False,
                                  image_loader=rand_img_loader())
    loader = BatchLoader(eval_ds, 4, shuffle=False)
    score_step = jax.jit(retrieve.make_score_step(model, cfg))
    out = retrieve.run_retrieval_eval(score_step, state, loader,
                                      eval_len_size=4)
    assert "mrr" in out and "hits" in out


def test_seq2seq_preprocessor_semantics(tok):
    from medvill_tpu.data.seq2seq import Seq2seqPreprocessor

    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=TINY_IMG, len_vis_input=4, max_len_b=10, max_seq_length=24,
        max_pred=3, img_size=64)
    rng = random.Random(0)
    proc = Seq2seqPreprocessor(cfg, tok, "s2s", rng=rng)
    out = proc(["word1", "word2", "word3"])
    n_tokens = int(out["mask_spec"][1])
    assert n_tokens == 1 + 4 + 1 + 3 + 1  # CLS img SEP txt SEP
    assert out["input_ids"].shape == (24,)
    # s2s segments: 4s then 5s (data_loader.py:342-348)
    assert out["segment_ids"][0] == 4 and out["segment_ids"][7] == 5
    assert out["masked_pos"].shape == (3,)
    # masked positions fall in the text region or are padding zeros
    for p, w in zip(out["masked_pos"], out["masked_weights"]):
        if w:
            assert p >= 6
    assert int(out["task_idx"]) == 3

    bi = Seq2seqPreprocessor(cfg, tok, "bi", rng=rng)(["word1"])
    assert bi["segment_ids"][0] == 0
    assert int(bi["task_idx"]) == 0


def test_seq2seq_force_eos_masking(tok):
    """~50% of samples force-mask the final [SEP]
    (data_loader.py:368-372)."""
    from medvill_tpu.data.seq2seq import Seq2seqPreprocessor

    cfg = FinetuneConfig(
        bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=TINY_IMG, len_vis_input=4, max_len_b=10, max_seq_length=24,
        max_pred=5, img_size=64)
    rng = random.Random(0)
    proc = Seq2seqPreprocessor(cfg, tok, "s2s", rng=rng)
    n_forced = 0
    for _ in range(100):
        out = proc([f"word{i}" for i in range(6)])
        n_tokens = int(out["mask_spec"][1])
        if (n_tokens - 1) in out["masked_pos"][:int(
                out["masked_weights"].sum())]:
            n_forced += 1
    assert 30 < n_forced < 70


def test_vqa_dataset_and_soft_targets(tok):
    from medvill_tpu.data.vqa import (VQADataset, preprocess_question,
                                      soft_target, synthetic_vqa_entries)

    assert preprocess_question("Is there edema? -yes/no") == "is there edema"
    assert preprocess_question("x ray of chest?") == "x-ray of chest"

    t = soft_target(dict(labels=[3, 7], scores=[0.5, 1.0]), 10)
    assert t[3] == 0.5 and t[7] == 1.0 and t.sum() == 1.5

    cfg = FinetuneConfig(
        task="vqa", bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=TINY_IMG, len_vis_input=4, max_len_b=10, max_seq_length=24,
        max_pred=3, img_size=64, vqa_num_answers=16)
    ds = VQADataset(cfg, tok, synthetic_vqa_entries(6, 16),
                    image_loader=rand_img_loader())
    ex = ds[0]
    assert ex["ans_target"].shape == (16,)
    assert ex["ans_type"] in (0, 1) and ex["organ"] == 0


def test_vqa_train_step(tok):
    from medvill_tpu.data.vqa import VQADataset, synthetic_vqa_entries
    from medvill_tpu.train import finetune as ft

    cfg = FinetuneConfig(
        task="vqa", bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=TINY_IMG, len_vis_input=4, max_len_b=10, max_seq_length=24,
        max_pred=3, img_size=64, vqa_num_answers=16, batch_size=4)
    ds = VQADataset(cfg, tok, synthetic_vqa_entries(8, 16),
                    image_loader=rand_img_loader())
    batch = next(iter(BatchLoader(ds, 4, shuffle=False)))
    model = ft.build_model(cfg)
    B, L = 2, cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, L), jnp.int32),
        jnp.zeros((B, L), jnp.int32), jnp.zeros((B, 1, L, L)),
        deterministic=True)
    tx = ft.make_finetune_tx(cfg)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(ft.make_train_step(model, tx, cfg, t_total=10))
    use = {k: jnp.asarray(v) for k, v in batch.items()
           if k in ("image", "input_ids", "segment_ids", "mask_spec",
                    "ans_target")}
    state, m = step(state, use, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["vqa_loss"]))
    assert float(m["batch_score"]) >= 0


def test_classification_freeze_phases(tok):
    """freeze=(img, txt) must hold the frozen subtrees bit-still through a
    train step (Adam + weight decay included) while the rest trains, and
    the SAME state must step through a later unfrozen phase (the CLI's
    phase-static specialization; reference intended semantics of
    mmbt/main.py:204-209 whose string flags never actually freeze)."""
    from medvill_tpu.data.classification import (ClassificationDataset,
                                                 get_labels_and_frequencies,
                                                 synthetic_clf_records)
    from medvill_tpu.train import classify

    labels = ["'A'", "'B'", "'C'"]
    recs = synthetic_clf_records(8, labels)
    got_labels, _ = get_labels_and_frequencies(recs)
    cfg = ClassificationConfig(
        bert=BertConfig.test_tiny(vocab_size=64), image=TINY_IMG,
        num_image_embeds=4, max_seq_len=16, img_size=64, batch_size=4,
        labels=tuple(got_labels), freeze_img=1)
    ds = ClassificationDataset(recs, tok, got_labels, cfg.max_seq_len,
                               cfg.num_image_embeds, cfg.img_size,
                               image_loader=rand_img_loader())
    batch = next(iter(BatchLoader(ds, 4, shuffle=False)))
    model = classify.build_model(cfg, len(got_labels))
    cls_id, sep_id = tok.vocab["[CLS]"], tok.vocab["[SEP]"]
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["input_txt"]),
                           jnp.asarray(batch["txt_len"]),
                           jnp.asarray(batch["segment"]),
                           jnp.asarray(batch["image"]), cls_id, sep_id)
    tx = classify.make_tx(cfg, t_total=10)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    b = jax.tree_util.tree_map(jnp.asarray, batch)

    frozen_step = jax.jit(classify.make_train_step(
        model, tx, cfg, 10, None, cls_id, sep_id, freeze=(True, False)))
    import flax
    before = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    # several steps: warmup_linear(0) == 0, so step 0 moves nothing by design
    for i in range(3):
        state, loss = frozen_step(state, b, jax.random.PRNGKey(1),
                                  jnp.asarray(1.0))
    assert np.isfinite(float(loss))
    after = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    img_moved = txt_moved = False
    for path, leaf in after.items():
        same = np.array_equal(before[path], leaf)
        if "img_encoder" in path:
            assert same, f"frozen img leaf moved: {path}"
            img_moved |= not same
        elif "encoder" in path:
            txt_moved |= not same
    assert txt_moved, "text encoder should train in the img-frozen phase"

    # unfrozen phase reuses the same state (opt_state structure unchanged)
    free_step = jax.jit(classify.make_train_step(
        model, tx, cfg, 10, None, cls_id, sep_id, freeze=(False, False)))
    state, loss = free_step(state, b, jax.random.PRNGKey(2),
                            jnp.asarray(1.0))
    final = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    img_moved = any("img_encoder" in p and not np.array_equal(after[p], l)
                    for p, l in final.items())
    assert img_moved, "img encoder should train once unfrozen"
