"""MIMIC report section splitting (reference behavior of the shipped
data_parsing/section_parser.cpython-36.pyc)."""
from medvill_tpu.data.section_parser import (findings_and_impression,
                                             parse_report, section_text)

REPORT = """                                 FINAL REPORT
 EXAMINATION:  CHEST (PORTABLE AP)

 INDICATION:  Shortness of breath.

 COMPARISON:  Prior study from ___.

 FINDINGS:
 Single portable view of the chest.  Lungs are clear.
 No pleural effusion.

 IMPRESSION:
 No acute cardiopulmonary process.
"""


def test_section_names_and_order():
    names, texts = section_text(REPORT)
    assert names == ["examination", "indication", "comparison", "findings",
                     "impression"]
    assert texts[0] == "CHEST (PORTABLE AP)"
    assert "Lungs are clear." in texts[3]


def test_preamble():
    names, texts = section_text("Some unlabeled text.\nFINDINGS: Clear.")
    assert names == ["preamble", "findings"]
    assert texts[0] == "Some unlabeled text."


def test_parse_report_normalizes_aliases():
    out = parse_report("CONCLUSION: No acute disease.")
    assert out == {"impression": "No acute disease."}


def test_findings_and_impression_payload():
    assert findings_and_impression(REPORT) == (
        "Single portable view of the chest. Lungs are clear. "
        "No pleural effusion. No acute cardiopulmonary process.")
    # fall back to whole text when unsectioned
    assert findings_and_impression("just text") == "just text"
