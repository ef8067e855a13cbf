"""Luhn-gated card redaction (functions/text.card_redact): known-valid and
known-invalid numbers, boundary handling, and multi-candidate docs."""

from __future__ import annotations

from html_parser_spark.functions import text as TXT

VALID = "4532015112830366"  # classic Luhn-valid test number
INVALID = "4532015112830367"


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text_cards string")
    return {r.doc_id: r for r in TXT.card_redact(df).collect()}


def test_known_valid_and_invalid(spark):
    out = _run(
        spark,
        [
            (1, f"pay {VALID} now"),
            (2, f"pay {INVALID} now"),
        ],
    )
    assert (out[1].n_candidates, out[1].n_valid) == (1, 1)
    assert out[1].text_clean == "pay <CARD> now"
    assert (out[2].n_candidates, out[2].n_valid) == (1, 0)
    assert out[2].text_clean == f"pay {INVALID} now"


def test_digit_run_boundaries(spark):
    # 17-digit runs and embedded 16-digit substrings are NOT candidates
    out = _run(
        spark,
        [
            (1, f"x {VALID}7 y"),  # 17 digits
            (2, f"{VALID}"),  # whole string, ^..$ boundaries
        ],
    )
    assert out[1].n_candidates == 0
    assert out[1].text_clean == f"x {VALID}7 y"
    assert out[2].text_clean == "<CARD>"


def test_multiple_candidates_mixed(spark):
    out = _run(spark, [(1, f"a {VALID} b {INVALID} c {VALID} d")])
    r = out[1]
    assert (r.n_candidates, r.n_valid) == (3, 2)
    assert r.text_clean == f"a <CARD> b {INVALID} c <CARD> d"
