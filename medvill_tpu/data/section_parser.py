"""MIMIC-CXR radiology-report section splitter.

The reference ships this component ONLY as compiled bytecode —
``/root/reference/data_parsing/__pycache__/section_parser.cpython-36.pyc``
(SURVEY.md §0: no source file exists in the repo).  This module is a
clean-room re-derivation: the behavior below was recovered by decoding the
pyc's marshal stream (constants + wordcode) and is reproduced exactly,
including quirks the bytecode proves the reference executes:

- the preamble slice ends at ``match.start(1)`` (the *group* start — the
  header's leading ``"\\n "`` stays attached to the preamble);
- the header pattern's trailing ``\\s`` can consume the newline of a bare
  ``HEADER:`` line, so a second header on the line immediately after it is
  swallowed into that section (its required leading newline is gone);
  the subsequent scan also resumes past the next physical newline
  (``idx_skip``), reproduced as executed;
- empty impression/findings sections are dropped (scanned back-to-front);
- when neither an impression nor a findings section survives, the last
  section's final ``"\\n \\n"``-separated paragraph block is split off as a
  synthetic ``last_paragraph`` section;
- ``custom_mimic_cxr_rules``'s study-specific overrides include a
  ``['history']`` list value for s51491012 and eight trailing ``[0, 0]``
  index windows — both verbatim in the compiled constants.

The splitter prepares MIMIC-CXR ``.txt`` reports into the ``text`` field of
the JSONL records every trainer consumes (data/pretrain.py etc.).
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

# a section header is an ALL-CAPS token run at the start of an indented
# line, terminated by a colon: e.g. "\n IMPRESSION:  ..."
_HEADER = re.compile(r"\n ([A-Z ()/,-]+):\s", re.DOTALL)

# canonical name for every header spelling observed in MIMIC-CXR
# (misspellings included); recovered one-to-one from the reference pyc
FREQUENT_SECTIONS: Dict[str, str] = {
    "preamble": "preamble",
    "impression": "impression",
    "comparison": "comparison",
    "indication": "indication",
    "findings": "findings",
    "examination": "examination",
    "technique": "technique",
    "history": "history",
    "comparisons": "comparison",
    "clinical history": "history",
    "reason for examination": "indication",
    "notification": "notification",
    "reason for exam": "indication",
    "clinical information": "history",
    "exam": "examination",
    "clinical indication": "indication",
    "conclusion": "impression",
    "chest, two views": "findings",
    "recommendation(s)": "recommendations",
    "type of examination": "examination",
    "reference exam": "comparison",
    "patient history": "history",
    "addendum": "addendum",
    "comparison exam": "comparison",
    "date": "date",
    "comment": "comment",
    "findings and impression": "impression",
    "wet read": "wet read",
    "comparison film": "comparison",
    "recommendations": "recommendations",
    "findings/impression": "impression",
    "pfi": "history",
    "recommendation": "recommendations",
    "wetread": "wet read",
    "ndication": "impression",
    "impresson": "impression",
    "imprression": "impression",
    "imoression": "impression",
    "impressoin": "impression",
    "imprssion": "impression",
    "impresion": "impression",
    "imperssion": "impression",
    "mpression": "impression",
    "impession": "impression",
    "findings/ impression": "impression",
    "finding": "findings",
    "findins": "findings",
    "findindgs": "findings",
    "findgings": "findings",
    "findngs": "findings",
    "findnings": "findings",
    "finidngs": "findings",
    "idication": "indication",
    "reference findings": "findings",
    "comparision": "comparison",
    "comparsion": "comparison",
    "comparrison": "comparison",
    "comparisions": "comparison",
}

# headers naming a radiographic view describe the findings
_VIEW_WORDS = (
    "chest", "portable", "pa and lateral", "lateral and pa",
    "ap and lateral", "lateral and ap", "frontal and", "two views",
    "frontal view", "pa view", "ap view", "one view", "lateral view",
    "bone window", "frontal upright", "frontal semi-upright", "ribs",
    "pa and lat",
)
_VIEW_RE = re.compile("({})".format("|".join(_VIEW_WORDS)))

# a header merely *containing* one of these is that section
_MAIN_SECTIONS = ("impression", "findings", "history", "comparison",
                  "addendum")


def normalize_section_names(section_names: List[str]) -> List[str]:
    """Map raw (lower-cased) header spellings to canonical section names.

    Resolution order per name: exact table hit → substring of a main
    section → radiographic-view pattern (→ findings) → unchanged.
    """
    out = [s.strip().lower() for s in section_names]
    for i, name in enumerate(out):
        if name in FREQUENT_SECTIONS:
            out[i] = FREQUENT_SECTIONS[name]
            continue
        main = next((m for m in _MAIN_SECTIONS if m in name), None)
        if main is not None:
            out[i] = main
        elif _VIEW_RE.search(name) is not None:
            out[i] = "findings"
    return out


def section_text(text: str) -> Tuple[List[str], List[str], List[int]]:
    """Split a radiology report into sections by ALL-CAPS headers.

    Returns ``(sections, section_names, section_idx)``: the text of each
    section, its normalized name, and the start offset of its text.  A
    report with no recognizable header is one ``full report`` section;
    otherwise the text before the first header is the ``preamble``.
    """
    sections: List[str] = []
    names: List[str] = []
    starts: List[int] = []

    match = _HEADER.search(text, 0)
    if match is None:
        sections, names, starts = [text], ["full report"], [0]
    else:
        # group start, not match start: the header's "\n " prefix stays
        # with the preamble slice
        sections.append(text[:match.start(1)])
        names.append("preamble")
        starts.append(0)
        while match is not None:
            header = match.group(1).lower()
            body_start = match.end()
            # resume the header scan past the next physical newline
            # (reference behavior, reproduced as executed)
            skip = text[body_start:].find("\n")
            if skip == -1:
                skip = 0
            match = _HEADER.search(text, body_start + skip)
            body_end = len(text) if match is None else match.start()
            sections.append(text[body_start:body_end])
            names.append(header)
            starts.append(body_start)

    names = normalize_section_names(names)

    # drop empty impression/findings sections (back-to-front so pops
    # don't shift pending indices)
    for i in reversed(range(len(names))):
        if names[i] in ("impression", "findings") and not sections[i].strip():
            sections.pop(i)
            names.pop(i)
            starts.pop(i)

    # no impression and no findings: split the final "\n \n" paragraph
    # block of the last section into a synthetic last_paragraph section
    if "impression" not in names and "findings" not in names:
        if "\n \n" in sections[-1]:
            paragraphs = sections[-1].split("\n \n")
            sections.append("\n \n".join(paragraphs[1:]))
            sections[-2] = paragraphs[0]
            names.append("last_paragraph")
            starts.append(starts[-1] + len(sections[-2]))

    return sections, names, starts


def custom_mimic_cxr_rules() -> Tuple[Dict[str, object], Dict[str, List[int]]]:
    """Study-specific overrides for reports the generic splitter mishandles.

    ``custom_section_names`` maps a study id to the section name whose text
    should be used for that study; ``custom_indices`` maps a study id to an
    explicit ``[start, end]`` character window of the report text.  Values
    (including s51491012's list and the trailing ``[0, 0]`` windows) are
    exactly the reference pyc's compiled constants.
    """
    custom_section_names: Dict[str, object] = {
        "s50913680": "recommendations",
        "s59363654": "examination",
        "s59279892": "technique",
        "s59768032": "recommendations",
        "s57936451": "indication",
        "s50058765": "technique",
        "s53356173": "examination",
        "s53202765": "technique",
        "s50808053": "technique",
        "s51966317": "indication",
        "s50743547": "examination",
        "s56451190": "note",
        "s59067458": "recommendations",
        "s59215320": "examination",
        "s55124749": "indication",
        "s54365831": "indication",
        "s59087630": "recommendations",
        "s58157373": "recommendations",
        "s56482935": "recommendations",
        "s58375018": "recommendations",
        "s54654948": "indication",
        "s55157853": "examination",
        "s51491012": ["history"],
    }
    custom_indices: Dict[str, List[int]] = {
        "s50525523": [201, 349],
        "s57564132": [233, 554],
        "s59982525": [313, 717],
        "s53488209": [149, 475],
        "s54875119": [234, 988],
        "s50196495": [59, 399],
        "s56579911": [59, 218],
        "s52648681": [292, 631],
        "s59889364": [172, 453],
        "s53514462": [73, 377],
        "s59505494": [59, 450],
        "s53182247": [59, 412],
        "s51410602": [47, 320],
        "s56412866": [522, 822],
        "s54986978": [59, 306],
        "s59003148": [262, 505],
        "s57150433": [61, 394],
        "s56760320": [219, 457],
        "s59562049": [158, 348],
        "s52674888": [145, 296],
        "s55258338": [192, 568],
        "s59330497": [140, 655],
        "s52119491": [179, 454],
        "s58235663": [0, 0],
        "s50798377": [0, 0],
        "s54168089": [0, 0],
        "s53071062": [0, 0],
        "s56724958": [0, 0],
        "s54231141": [0, 0],
        "s53607029": [0, 0],
        "s52035334": [0, 0],
    }
    return custom_section_names, custom_indices


# section preference when reducing a report to one training text; the
# MIMIC-CXR convention (impression first, as in the public create_section
# workflow the reference's data prep follows)
_PREFERENCE = ("impression", "findings", "last_paragraph", "comparison")


def parse_report(text: str) -> Dict[str, str]:
    """Dict view of :func:`section_text`; repeated sections concatenate.

    Section bodies are whitespace-normalized (the JSONL ``text`` field
    convention); preamble/full-report pseudo-sections are included.
    """
    sections, names, _ = section_text(text)
    out: Dict[str, str] = {}
    for name, body in zip(names, sections):
        body = " ".join(body.split())
        if not body:
            continue
        out[name] = (out[name] + " " + body).strip() if name in out else body
    return out


def findings_and_impression(text: str) -> str:
    """The pretraining text payload: findings + impression when present,
    else impression, else findings, else the whole cleaned report."""
    sections = parse_report(text)
    f, i = sections.get("findings", ""), sections.get("impression", "")
    if f and i:
        return f + " " + i
    return i or f or " ".join(text.split())


def extract_report_text(report: str, study_id: str | None = None) -> str:
    """Reduce a raw report to the single text used for a JSONL record.

    Applies the study-specific overrides when ``study_id`` (``sXXXXXXXX``)
    is given, then picks the first section present in preference order
    impression > findings > last_paragraph > comparison; returns '' when
    none is found (callers should skip such studies).
    """
    if study_id is not None:
        custom_names, custom_windows = custom_mimic_cxr_rules()
        if study_id in custom_windows:
            lo, hi = custom_windows[study_id]
            return report[lo:hi].strip()
        if study_id in custom_names:
            wanted = custom_names[study_id]
            wanted = wanted if isinstance(wanted, list) else [wanted]
            sections, names, _ = section_text(report)
            for w in wanted:
                if w in names:
                    return sections[names.index(w)].strip()
            return ""
    sections, names, _ = section_text(report)
    for preferred in _PREFERENCE:
        if preferred in names:
            return sections[names.index(preferred)].strip()
    return ""
