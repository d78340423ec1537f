"""Host-side stochastic data ops (reference: data/dataset_origin.py:183-235,
sc/data_loader.py:24-59)."""
import random

import numpy as np
import pytest

from medvill_tpu.data import sampling as S


def test_random_word_at_least_one_mask():
    rng = random.Random(0)
    for trial in range(50):
        tokens = list(range(10, 20))
        out, labels = S.random_word(list(tokens), vocab_len=100, mask_id=4,
                                    rng=rng)
        assert any(l != -100 for l in labels)
        # non-masked positions keep original token and get -100
        for t0, t1, l in zip(tokens, out, labels):
            if l == -100:
                assert t1 == t0


def test_random_word_distribution():
    rng = random.Random(1)
    n_changed, n_total, n_masked = 0, 0, 0
    for _ in range(200):
        tokens = list(range(10, 110))
        out, labels = S.random_word(list(tokens), vocab_len=1000, mask_id=4,
                                    rng=rng)
        for t0, t1, l in zip(tokens, out, labels):
            n_total += 1
            if l != -100:
                n_changed += 1
                if t1 == 4:
                    n_masked += 1
    assert 0.12 < n_changed / n_total < 0.18      # ~15%
    assert 0.7 < n_masked / n_changed < 0.9       # ~80% of selected


def test_labels_match_token_sort():
    assert S.labels_match("'Edema', 'Cardiomegaly'",
                          "'Cardiomegaly', 'Edema'")
    assert not S.labels_match("'Edema'", "'Cardiomegaly'")
    assert S.labels_match("A b", "B A")  # case/sort insensitive


def test_labels_match_force_ascii_semantics():
    """fuzzywuzzy's default full_process(force_ascii=True) deletes exactly
    code points U+0080..U+00FF (utils.asciidammit) — so Latin-1 accents
    vanish while higher-plane word chars survive.  token_sort_ratio
    references: 'Œdème'(U+0152,U+00E8) -> 'dme'; CJK stays."""
    assert S.labels_match("Œdème", "Œdme")   # è (U+00E8) deleted; Œ is
    # U+0152 (>0xFF) and survives on both sides
    assert S.labels_match("café", "caf")      # é deleted
    assert not S.labels_match("café", "cafe")
    assert S.labels_match("肺炎", "肺炎")      # CJK word chars survive
    assert not S.labels_match("肺炎", "")


def test_random_pair_sampling_aligned_and_negative():
    data = [dict(label=f"l{i % 2}", text=f"t{i}", img=f"i{i}.jpg")
            for i in range(20)]
    rng = random.Random(0)
    n_aligned = 0
    for _ in range(100):
        txt, img, aligned, prob = S.random_pair_sampling(0, data, rng)
        if aligned:
            n_aligned += 1
            assert txt == "t0" and img == "i0.jpg"
        else:
            # negative keeps the image, swaps text from a different label
            assert img == "i0.jpg"
            idx = int(txt[1:])
            assert data[idx]["label"] != data[0]["label"]
    assert 30 < n_aligned < 70


def test_truncate_tokens_pair_caps():
    rng = random.Random(0)
    a = list(range(10))
    b = list(range(20))
    S.truncate_tokens_pair(a, b, max_len=15, max_len_b=8, rng=rng)
    assert len(b) <= 8 and len(a) + len(b) <= 15


def test_truncate_txt():
    t = list(range(10))
    S.truncate_txt(t, 4)
    assert t == [0, 1, 2, 3]
