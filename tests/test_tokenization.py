"""Tokenizer round-trips + vendored-semantics checks
(SURVEY.md §4: tokenizer round-trips)."""
import numpy as np
import pytest

from medvill_tpu.data.tokenization import (BasicTokenizer, BertTokenizer,
                                           WordpieceTokenizer, build_vocab,
                                           detokenize, load_vocab)


def test_basic_tokenizer_lower_punct():
    t = BasicTokenizer()
    assert t.tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert t.tokenize("  spaces\teverywhere\n") == ["spaces", "everywhere"]


def test_basic_tokenizer_accents_and_never_split():
    t = BasicTokenizer()
    assert t.tokenize("café") == ["cafe"]
    assert t.tokenize("[SEP]") == ["[SEP]"]


def test_wordpiece_greedy_longest_match():
    vocab = {"un": 0, "##aff": 1, "##able": 2, "[UNK]": 3, "aff": 4}
    wp = WordpieceTokenizer(vocab)
    assert wp.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert wp.tokenize("xyz") == ["[UNK]"]


def test_wordpiece_long_word_to_unk():
    wp = WordpieceTokenizer({"[UNK]": 0, "a": 1})
    assert wp.tokenize("a" * 101) == ["[UNK]"]


def test_vocab_remap(tmp_path):
    """[unused1]->[X_SEP], [unused2..11]->[SEP_0..9]
    (reference: sc/pytorch_pretrained_bert/tokenization.py:57-77)."""
    vf = tmp_path / "vocab.txt"
    toks = ["[PAD]", "[unused1]", "[unused2]", "[unused11]", "[unused12]",
            "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello"]
    vf.write_text("\n".join(toks) + "\n")
    vocab = load_vocab(str(vf))
    assert vocab["[X_SEP]"] == 1
    assert vocab["[SEP_0]"] == 2
    assert vocab["[SEP_9]"] == 3
    assert "[unused12]" in vocab  # beyond the remap range stays
    plain = load_vocab(str(vf), remap_unused=False)
    assert "[unused1]" in plain and "[X_SEP]" not in plain


def test_roundtrip_ids():
    tok = BertTokenizer(build_vocab(["hello", "world"]))
    ids = tok.convert_tokens_to_ids(tok.tokenize("hello world"))
    assert tok.convert_ids_to_tokens(ids) == ["hello", "world"]


def test_detokenize_merges_continuations():
    """(reference: sc/generation_decode.py:97-104)."""
    assert detokenize(["un", "##aff", "##able", "cat"]) == ["unaffable", "cat"]
    assert detokenize(["##weird"]) == ["##weird"]
