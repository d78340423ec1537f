"""BatchLoader(workers>1) determinism: parallel fetches draw from
per-sample RNGs derived from (seed, epoch, idx) via the datasets'
``fetch(idx, rng)`` protocol, so epochs are bit-identical for ANY worker
count and across runs regardless of thread scheduling.  (The reference's
DataLoader(num_workers=N) per-worker seeding is only deterministic for a
fixed N; ours is worker-count-invariant.)  workers<=1 keeps the shared
sequential stream that the RNG-parity tests pin down."""
import random

import numpy as np
import pytest

from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig, PretrainConfig,
                                     RetrievalConfig)
from medvill_tpu.data.pretrain import (BatchLoader, CXRPretrainDataset,
                                       synthetic_records)
from medvill_tpu.data.retrieval import CXRRetrievalDataset
from medvill_tpu.data.seq2seq import Img2TxtDataset
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab

WORDS = [f"word{i}" for i in range(50)]


def _tokenizer():
    return BertTokenizer(build_vocab(WORDS))


def _stub_image(shape=(8, 8, 3)):
    return lambda p: np.zeros(shape, np.float32)


def _pretrain_cfg():
    return PretrainConfig(
        seq_len=7, batch_size=4,
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=8, num_image_embeds=3))


def _epoch_batches(workers, seed=3, epochs=1):
    cfg = _pretrain_cfg()
    ds = CXRPretrainDataset(synthetic_records(16), _tokenizer(), cfg,
                            seed=seed, image_loader=_stub_image())
    loader = BatchLoader(ds, 4, shuffle=True, seed=seed, workers=workers)
    out = []
    for _ in range(epochs):
        out.append([b for b in loader])
    return out


def _assert_epoch_equal(ea, eb):
    assert len(ea) == len(eb)
    for ba, bb in zip(ea, eb):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_worker_count_invariant():
    (e2,) = _epoch_batches(workers=2)
    (e3,) = _epoch_batches(workers=3)
    _assert_epoch_equal(e2, e3)
    # and rerun-stable (fresh pool, fresh dataset, same seed)
    (e2b,) = _epoch_batches(workers=2)
    _assert_epoch_equal(e2, e2b)


def test_epochs_draw_different_masks():
    e1, e2 = _epoch_batches(workers=2, epochs=2)
    # the epoch index is folded into every per-sample RNG, so the second
    # epoch's stochastic fields (masking / ITM negatives) must differ
    diff = any(
        not np.array_equal(b1[k], b2[k])
        for b1, b2 in zip(e1, e2) for k in ("txt_labels", "is_aligned"))
    assert diff


def test_seq2seq_fetch_rng_override():
    cfg = FinetuneConfig(
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=8, num_image_embeds=3),
        len_vis_input=3, img_size=8, max_seq_length=24, max_len_b=8,
        max_pred=4)
    recs = [dict(id=str(i), text=" ".join(WORDS[i:i + 6]), img=f"{i}.png")
            for i in range(4)]
    ds = Img2TxtDataset(recs, _tokenizer(), cfg, seed=0,
                        image_loader=_stub_image())
    a = ds.fetch(1, random.Random("k"))
    b = ds.fetch(1, random.Random("k"))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_retrieval_fetch_rng_override():
    cfg = RetrievalConfig(
        seq_len=7, bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=8, num_image_embeds=3))
    recs = [dict(id=str(i), text=" ".join(WORDS[i:i + 5]),
                 img=f"{i}.png", label=f"'L{i % 3}'")
            for i in range(8)]
    ds = CXRRetrievalDataset(recs, _tokenizer(), cfg, is_train=True,
                             seed=0, image_loader=_stub_image())
    ia, pa, na = ds.fetch(2, random.Random("k"))
    ib, pb, nb = ds.fetch(2, random.Random("k"))
    assert ia == ib
    for xa, xb in ((pa, pb), (na, nb)):
        for k in xa:
            np.testing.assert_array_equal(xa[k], xb[k], err_msg=k)


def test_drop_last_false_yields_all_samples():
    """Eval loaders pass drop_last=False so metrics cover every example
    (reference eval DataLoaders default drop_last=False); the tail batch is
    ragged.  drop_last=True (default) keeps the old floor semantics."""
    cfg = _pretrain_cfg()
    ds = CXRPretrainDataset(synthetic_records(14), _tokenizer(), cfg,
                            seed=0, image_loader=_stub_image())
    full = BatchLoader(ds, 4, shuffle=False, drop_last=False)
    assert len(full) == 4
    sizes = [b["input_txt"].shape[0] for b in full]
    assert sizes == [4, 4, 4, 2]
    dropped = BatchLoader(ds, 4, shuffle=False)
    assert len(dropped) == 3
    assert [b["input_txt"].shape[0] for b in dropped] == [4, 4, 4]


def test_drop_last_false_rejects_sharding():
    """Per-shard ceil can differ across shards (9 samples / 2 shards /
    batch 4 -> 2 vs 1 batches), deadlocking multi-host collectives — the
    combination must be rejected loudly at construction."""
    cfg = _pretrain_cfg()
    ds = CXRPretrainDataset(synthetic_records(9), _tokenizer(), cfg,
                            seed=0, image_loader=_stub_image())
    with pytest.raises(ValueError, match="drop_last"):
        BatchLoader(ds, 4, shuffle=False, drop_last=False,
                    num_shards=2, shard_index=0)


def test_prefetch_loader_releases_producer_on_early_exit():
    """Abandoning a PrefetchLoader iterator mid-epoch must not leave the
    producer thread blocked on a full queue holding prefetched batches."""
    import threading
    import time

    from medvill_tpu.data.pretrain import PrefetchLoader

    produced = []

    def slow_batches():
        for i in range(50):
            produced.append(i)
            yield {"x": np.full((2,), i)}

    before = threading.active_count()
    it = iter(PrefetchLoader(slow_batches(), depth=1))
    assert next(it)["x"][0] == 0
    it.close()  # GeneratorExit -> stop event + queue drain
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert len(produced) < 50, "producer ran the whole epoch after abandon"


def test_retrieval_label_conditioned_exhausted_negatives():
    """When every other record shares the anchor's label, the negative
    degrades to a same-label DIFFERENT record (the reference hits
    UnboundLocalError here) — never the positive pair itself re-labeled 0."""
    recs = [dict(id=str(i), split="train", label="'Normal'",
                 text=f"report number {i}", img=f"/img/{i}.png")
            for i in range(3)]
    cfg = RetrievalConfig(seq_len=7, batch_size=2,
                          bert=BertConfig.test_tiny(vocab_size=64),
                          image=ImageEncoderConfig(img_size=8,
                                                   num_image_embeds=3))
    seen_imgs = {}
    ds = CXRRetrievalDataset(recs, _tokenizer(), cfg, is_train=True,
                             label_conditioned=True,
                             image_loader=lambda p: seen_imgs.setdefault(
                                 p, np.full((8, 8, 3), len(seen_imgs),
                                            np.float32)))
    idx, pos, neg = ds.fetch(0, random.Random(0))
    assert neg["is_aligned"] == 0
    # the negative must differ from the positive in text or image
    assert (not np.array_equal(neg["input_txt"], pos["input_txt"])
            or not np.array_equal(neg["image"], pos["image"]))


def test_random_word_empty_tokens():
    from medvill_tpu.data.sampling import random_word

    toks, labels = random_word([], 64, 4, random.Random(0))
    assert toks == [] and labels == []
