"""Validation-stage units: suspicious-pattern scan, risk levels, sha256."""

import hashlib

import pyarrow as pa

from ocr_processor_ray.stages.validate import add_sha256, classify_risk, scan_batch


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_scan_flags_and_scores():
    texts = [
        "perfectly clean text",
        "has a <SCRIPT>alert()</script> tag",
        "MZ\x90 executable header plus ../../etc/passwd traversal",
        "javascript:void(0) with onload = x and \x00",
    ]
    out = classify_risk(scan_batch(_batch(texts)))
    assert out["risk_score"].to_pylist() == [0, 2, 5, 6]
    assert out["risk_level"].to_pylist() == ["low", "medium", "critical", "critical"]
    assert out["flag_script_tag"].to_pylist() == [False, True, False, False]
    assert out["flag_path_traversal"].to_pylist() == [False, False, True, False]


def test_risk_level_boundaries():
    # scores 1-2 medium, 3-4 high per security_validator.py:474-492 bucketing
    out = classify_risk(scan_batch(_batch(["onclick = go", "\x7fELF binary"])))
    assert out["risk_score"].to_pylist() == [1, 3]
    assert out["risk_level"].to_pylist() == ["medium", "high"]


def test_sha256_matches_hashlib():
    texts = ["abc", "שלום"]
    out = add_sha256(_batch(texts))
    want = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    assert out["sha256"].to_pylist() == want
