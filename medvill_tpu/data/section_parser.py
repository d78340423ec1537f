"""MIMIC-CXR radiology-report section splitter.

The reference ships only a compiled ``section_parser.cpython-36.pyc``
(reference: data_parsing/; SURVEY.md §0) whose role is splitting raw MIMIC
reports into sections — preamble / findings / impression / etc. — so the
pretraining JSONL can carry the findings+impression text.  This is a clean
reimplementation of that behavior: scan for known section headers
("FINDINGS:", "IMPRESSION:", ...), emit (section_name, text) pairs, with
everything before the first header as the preamble.
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

# canonical section headers seen in MIMIC-CXR reports (upper-case, trailing
# colon in the raw text); keys are normalized names
SECTION_TITLES = {
    "EXAMINATION": "examination",
    "EXAM": "examination",
    "INDICATION": "indication",
    "HISTORY": "history",
    "CLINICAL HISTORY": "history",
    "CLINICAL INFORMATION": "history",
    "REASON FOR EXAM": "indication",
    "REASON FOR EXAMINATION": "indication",
    "TECHNIQUE": "technique",
    "COMPARISON": "comparison",
    "COMPARISONS": "comparison",
    "FINDINGS": "findings",
    "FINDING": "findings",
    "IMPRESSION": "impression",
    "IMPRESSIONS": "impression",
    "CONCLUSION": "impression",
    "RECOMMENDATION": "recommendation",
    "RECOMMENDATIONS": "recommendation",
    "NOTIFICATION": "notification",
    "WET READ": "wet_read",
    "FINAL REPORT": None,  # banner, not a section
}

_HEADER_RE = re.compile(
    r"^\s*(" + "|".join(re.escape(t) for t in sorted(
        SECTION_TITLES, key=len, reverse=True)) + r")\s*:",
    re.IGNORECASE | re.MULTILINE)


def section_text(text: str) -> Tuple[List[str], List[str]]:
    """Split a raw report into (section_names, section_texts).

    Text before the first recognized header is the ``preamble``.  Banner
    lines ("FINAL REPORT") are dropped.  Section names are normalized
    (e.g. CONCLUSION -> impression).
    """
    # drop banner lines (no colon in the raw text)
    text = re.sub(r"^\s*FINAL REPORT\s*$", "", text,
                  flags=re.IGNORECASE | re.MULTILINE)
    names: List[str] = []
    texts: List[str] = []
    matches = list(_HEADER_RE.finditer(text))
    first = matches[0].start() if matches else len(text)
    preamble = text[:first].strip()
    if preamble:
        names.append("preamble")
        texts.append(_clean(preamble))
    for i, m in enumerate(matches):
        raw = m.group(1).upper().strip()
        norm = SECTION_TITLES.get(raw)
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        body = text[m.end():end].strip()
        if norm is None:
            continue
        names.append(norm)
        texts.append(_clean(body))
    return names, texts


def _clean(s: str) -> str:
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def parse_report(text: str) -> Dict[str, str]:
    """Dict view; later occurrences of a repeated section are concatenated."""
    names, texts = section_text(text)
    out: Dict[str, str] = {}
    for n, t in zip(names, texts):
        out[n] = (out[n] + " " + t).strip() if n in out else t
    return out


def findings_and_impression(text: str) -> str:
    """The pretraining text payload: findings + impression when present,
    else impression, else findings, else the whole cleaned report."""
    sections = parse_report(text)
    f, i = sections.get("findings", ""), sections.get("impression", "")
    if f and i:
        return f + " " + i
    return i or f or _clean(text)
