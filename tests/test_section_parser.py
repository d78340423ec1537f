"""Section-parser tests: golden splits for every behavioral quirk, plus a
constants-parity oracle that decodes the reference's compiled-only
``section_parser.cpython-36.pyc`` (the ONLY form the reference ships it in —
SURVEY.md §0) and asserts our normalization/custom-rule tables match its
marshal stream exactly."""
import os
import struct

import pytest

from medvill_tpu.data.section_parser import (FREQUENT_SECTIONS,
                                             custom_mimic_cxr_rules,
                                             extract_report_text,
                                             findings_and_impression,
                                             normalize_section_names,
                                             parse_report, section_text)

REF_PYC = ("/root/reference/data_parsing/__pycache__/"
           "section_parser.cpython-36.pyc")


def test_basic_split_with_preamble():
    text = ("WET READ VERSION\n \n"
            " COMPARISON:  Chest radiograph dated XYZ.\n \n"
            " IMPRESSION:  No acute process.\n \n"
            " FINDINGS:  Lungs are clear.\n")
    sections, names, idx = section_text(text)
    assert names == ["preamble", "comparison", "impression", "findings"]
    # preamble ends at the group start: the header's "\n " prefix stays
    # attached to the preamble slice
    assert sections[0] == "WET READ VERSION\n \n "
    assert sections[1].strip() == "Chest radiograph dated XYZ."
    assert sections[2].strip() == "No acute process."
    assert sections[3].strip() == "Lungs are clear."
    # start offsets point at the section text, not the header
    for body, start in zip(sections[1:], idx[1:]):
        assert text[start:start + len(body)] == body


def test_no_header_is_full_report():
    sections, names, idx = section_text("just one paragraph of text")
    assert names == ["full report"]
    assert idx == [0]


def test_header_normalization_misspellings():
    assert normalize_section_names(
        ["IMPRESSON", "findngs", "comparision", "reason for exam",
         "conclusion", "pfi"]) == [
        "impression", "findings", "comparison", "indication",
        # pfi -> history is the compiled reference's mapping (it deviates
        # from the public MIT-LCP table, as do 'clinical information' and
        # 'ndication' — the bytecode oracle below pins all three)
        "impression", "history"]


def test_header_normalization_substring_and_views():
    # substring of a main section wins before the view regex
    assert normalize_section_names(["late impression addendum"]) == [
        "impression"]
    # unknown view-style headers resolve to findings
    assert normalize_section_names(
        ["pa and lateral chest radiograph", "portable upright"]) == [
        "findings", "findings"]
    # completely unknown names pass through (lower-cased)
    assert normalize_section_names(["ZEBRA"]) == ["zebra"]


def test_empty_impression_dropped_and_last_paragraph_created():
    text = ("Preamble line\n \n"
            " IMPRESSION:   \n"
            " COMPARISON:  Prior study.\n \n"
            "Final conclusion paragraph.\n")
    sections, names, idx = section_text(text)
    # the whitespace-only impression is dropped, so neither impression nor
    # findings survives; the last section's trailing "\n \n" paragraph
    # block becomes the synthetic last_paragraph
    assert "impression" not in names
    assert names == ["preamble", "comparison", "last_paragraph"]
    assert sections[-1] == "Final conclusion paragraph.\n"
    # ":\s" consumed one of the two spaces after the colon
    assert sections[-2] == " Prior study."
    assert idx[-1] == idx[-2] + len(sections[-2])


def test_bare_header_swallows_next_line_header():
    # "FINDINGS:\n" — the pattern's trailing \s consumes the newline, so
    # the IMPRESSION header on the very next line loses its required
    # leading "\n" and is swallowed into the findings section
    text = ("\n FINDINGS:\n IMPRESSION: swallowed text\n \nmore\n")
    sections, names, _ = section_text(text)
    assert names == ["preamble", "findings"]
    assert "IMPRESSION: swallowed text" in sections[1]


def test_extract_report_text_preference_and_custom_rules():
    text = (" COMPARISON:  prior.\n \n"
            " FINDINGS:  Clear lungs.\n \n"
            " IMPRESSION:  Normal.\n")
    assert extract_report_text(text) == "Normal."
    no_imp = " COMPARISON:  prior.\n \n FINDINGS:  Clear lungs.\n"
    assert extract_report_text(no_imp) == "Clear lungs."
    # custom index window wins over section parsing
    names, windows = custom_mimic_cxr_rules()
    sid = "s50525523"
    lo, hi = windows[sid]
    long_text = "x" * 400
    assert extract_report_text(long_text, sid) == long_text[lo:hi].strip()
    # custom section-name override (including the list-valued entry)
    assert names["s51491012"] == ["history"]
    got = extract_report_text("\n HISTORY:  Fell down.\n", "s51491012")
    assert got == "Fell down."


def test_parse_report_and_findings_and_impression():
    text = ("\n EXAMINATION:  CHEST (PORTABLE AP)\n \n"
            " FINDINGS:  Lungs are clear.\n No effusion.\n \n"
            " IMPRESSION:  No acute process.\n")
    out = parse_report(text)
    assert out["findings"] == "Lungs are clear. No effusion."
    assert out["impression"] == "No acute process."
    assert out["examination"] == "CHEST (PORTABLE AP)"
    assert (findings_and_impression(text)
            == "Lungs are clear. No effusion. No acute process.")
    # no sections at all -> cleaned full text
    assert findings_and_impression("plain  text\nhere") == "plain text here"


# ---------------------------------------------------------------------------
# parity oracle vs the compiled reference
# ---------------------------------------------------------------------------


class _Code:
    pass


def _read_marshal(data):
    """Minimal py3.6 marshal reader (enough types for this pyc)."""
    pos = [0]
    refs = []

    def u8():
        v = data[pos[0]]
        pos[0] += 1
        return v

    def i32():
        v = struct.unpack_from("<i", data, pos[0])[0]
        pos[0] += 4
        return v

    def take(n):
        v = data[pos[0]:pos[0] + n]
        pos[0] += n
        return v

    def read():
        t = u8()
        flag_ref = bool(t & 0x80)
        t = chr(t & 0x7F)
        slot = None
        if flag_ref:
            slot = len(refs)
            refs.append(None)

        def done(v):
            if flag_ref:
                refs[slot] = v
            return v

        if t == "N":
            return done(None)
        if t in "FT":
            return done(t == "T")
        if t == "i":
            return done(i32())
        if t in "zZ":
            return done(take(u8()).decode("ascii"))
        if t in "aA":
            return done(take(i32()).decode("ascii"))
        if t in "ut":
            return done(take(i32()).decode("utf8"))
        if t == "s":
            return done(take(i32()))
        if t in ")(":
            n = u8() if t == ")" else i32()
            return done(tuple(read() for _ in range(n)))
        if t == "r":
            return refs[i32()]
        if t == "c":
            c = _Code()
            done(c)
            (c.argcount, c.kwonlyargcount, c.nlocals, c.stacksize,
             c.flags) = (i32() for _ in range(5))
            for field in ("code", "consts", "names", "varnames", "freevars",
                          "cellvars", "filename", "name"):
                setattr(c, field, read())
            c.firstlineno = i32()
            c.lnotab = read()
            return c
        raise AssertionError(f"unhandled marshal type {t!r}")

    return read()


def _load_const_seq(code):
    """(value) sequence of LOAD_CONST ops in py3.6 wordcode order."""
    out = []
    raw = code.code
    for i in range(0, len(raw), 2):
        if raw[i] == 100:  # LOAD_CONST
            out.append(code.consts[raw[i + 1]])
    return out


@pytest.mark.skipif(not os.path.exists(REF_PYC),
                    reason="reference pyc not available")
def test_tables_match_reference_bytecode():
    mod = _read_marshal(open(REF_PYC, "rb").read()[12:])
    by_name = {c.name: c for c in mod.consts if isinstance(c, _Code)}

    # normalize_section_names: 58-key spelling table, value order pairs
    # with the BUILD_CONST_KEY_MAP keys tuple
    norm = by_name["normalize_section_names"]
    consts = _load_const_seq(norm)
    keys = next(c for c in consts if isinstance(c, tuple) and len(c) == 58)
    values = [c for c in consts[:consts.index(keys)]
              if isinstance(c, str) and not c.startswith("normalize")][-58:]
    assert dict(zip(keys, values)) == FREQUENT_SECTIONS

    # custom rules: both dicts reproduced exactly, including the
    # list-valued s51491012 entry and the [0, 0] windows
    cust = by_name["custom_mimic_cxr_rules"]
    consts = _load_const_seq(cust)
    name_keys = next(c for c in consts
                     if isinstance(c, tuple) and len(c) == 23)
    idx_keys = next(c for c in consts
                    if isinstance(c, tuple) and len(c) == 31)
    str_values = [c for c in consts[:consts.index(name_keys)]
                  if isinstance(c, str)]
    ints = [c for c in consts if isinstance(c, int)]
    ref_names = dict(zip(name_keys, str_values))
    ref_names[name_keys[-1]] = [str_values[-1]]  # BUILD_LIST 1 tail
    got_names, got_idx = custom_mimic_cxr_rules()
    assert got_names == ref_names
    pairs = [[ints[i], ints[i + 1]] for i in range(0, 2 * len(idx_keys), 2)]
    assert got_idx == dict(zip(idx_keys, pairs))
