"""Native (C++) wordpiece tokenizer: builds, matches the Python tokenizer
exactly on ASCII, and falls back for non-ASCII."""
import random

import pytest

from medvill_tpu.data.native_tokenizer import (NativeBertTokenizer,
                                               build_library)
from medvill_tpu.data.tokenization import BertTokenizer, load_vocab


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    words = (["[PAD]", "[unused1]", "[unused2]", "[UNK]", "[CLS]", "[SEP]",
              "[MASK]"]
             + [f"word{i}" for i in range(30)]
             + ["##s", "##ing", "lung", "pleura", "##l", "effusion", "the",
                "right", "left", "un", "##aff", "##able", ",", ".", "-"])
    f = d / "vocab.txt"
    f.write_text("\n".join(words) + "\n")
    return str(f)


@pytest.fixture(scope="module")
def native(vocab_file):
    lib = build_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    t = NativeBertTokenizer(vocab_file)
    if not t.native_available:
        pytest.skip("native library failed to load")
    return t


def python_ids(vocab_file, text):
    t = BertTokenizer(load_vocab(vocab_file))
    unk = t.vocab["[UNK]"]
    return [t.vocab.get(tok, unk) for tok in t.tokenize(text)]


@pytest.mark.parametrize("text", [
    "The right lung is clear.",
    "pleural effusions, left.",
    "unaffable word3 word29 nonsense-token",
    "  spaces\teverywhere\n and , punct..",
    "UPPER case LUNG",
    "",
    "a" * 150,  # long word -> [UNK]
])
def test_native_matches_python(native, vocab_file, text):
    assert native.tokenize_to_ids(text) == python_ids(vocab_file, text)


def test_native_fuzz_matches_python(native, vocab_file):
    rng = random.Random(0)
    pieces = ["lung", "pleural", "effusion", "the", "right", "left",
              "word5", "xyzzy", ",", ".", "-", "  ", "\t", "CAPS"]
    for _ in range(200):
        text = "".join(rng.choice(pieces + [" "])
                       for _ in range(rng.randint(0, 30)))
        assert native.tokenize_to_ids(text) == python_ids(vocab_file, text), \
            repr(text)


def test_non_ascii_falls_back(native, vocab_file):
    text = "café effusion"
    # falls back to python path (accent stripping) — same result either way
    assert native.tokenize_to_ids(text) == python_ids(vocab_file, text)


def test_special_token_in_text_falls_back(native, vocab_file):
    text = "report [SEP] more"
    assert native.tokenize_to_ids(text) == python_ids(vocab_file, text)


def test_vocab_remap_applied(native):
    assert "[X_SEP]" in native.vocab
    assert "[SEP_0]" in native.vocab


def test_native_faster_than_python(native, vocab_file):
    import time

    text = "the right lung is clear . pleural effusion left " * 20
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        native.tokenize_to_ids(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        python_ids(vocab_file, text)
    t_python = time.perf_counter() - t0
    # building the python tokenizer per call dominates; compare loosely
    assert t_native < t_python


def test_overflow_falls_back_exactly(native, vocab_file):
    """A text producing more than MAX_IDS wordpieces must NOT be silently
    truncated by the C path: the library signals overflow (-1) and the
    wrapper takes the exact Python fallback, so outputs stay identical."""
    text = "lung " * (native.MAX_IDS + 10)
    got = native.tokenize_to_ids(text)
    want = python_ids(vocab_file, text)
    assert len(got) > native.MAX_IDS
    assert got == want


def test_rebuild_on_source_drift(tmp_path, monkeypatch):
    """The .so is not checked into git; build_library must rebuild when
    wordpiece.cc drifts (a stale binary silently winning over edited
    source was the failure mode that kept the .so out of the tree)."""
    import os
    import shutil

    from medvill_tpu.data import native_tokenizer as nt

    d = tmp_path / "native"
    shutil.copytree(nt._NATIVE_DIR, d,
                    ignore=shutil.ignore_patterns("*.so", "*.sha256"))
    monkeypatch.setattr(nt, "_NATIVE_DIR", str(d))
    monkeypatch.setattr(nt, "_LIB_PATH", str(d / "libwordpiece.so"))
    monkeypatch.setattr(nt, "_SRC_PATH", str(d / "wordpiece.cc"))
    monkeypatch.setattr(nt, "_STAMP_PATH",
                        str(d / "libwordpiece.so.src.sha256"))
    lib = nt.build_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    assert os.path.exists(nt._STAMP_PATH)
    mtime1 = os.path.getmtime(lib)
    # unchanged source -> no rebuild
    assert nt.build_library() == lib
    assert os.path.getmtime(lib) == mtime1
    # drifted source -> rebuild + fresh stamp
    with open(nt._SRC_PATH, "a") as f:
        f.write("\n// drift marker\n")
    os.utime(lib, (mtime1 - 100, mtime1 - 100))  # make rebuild observable
    assert nt.build_library() == lib
    assert os.path.getmtime(lib) > mtime1 - 100
    with open(nt._STAMP_PATH) as f:
        assert f.read().strip() == nt._src_digest()
