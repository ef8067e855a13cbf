"""Cross-validate the Python oracle against the reference's Node bundle.

Runs every non-divergent fixture through BOTH the reference
(/root/reference/demo/core/index.js, via tools/node_eval.mjs) and the oracle,
comparing full ASTs for 'ok' fixtures and error classes for 'error' fixtures.
Divergent fixtures (the reference hangs) are excluded — their classification
was verified once by hand with per-case timeouts (see core/oracle.py).

Skipped automatically when node or the reference bundle is unavailable.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

# deep_nesting fixtures (depth 4000) exceed the default limit during JSON
# decode and AST normalization (both recursive)
sys.setrecursionlimit(100_000)

from html_parser_spark.core import oracle
from html_parser_spark.sources.fixtures import DIVERGENT, FIXTURES

BUNDLE = Path("/root/reference/demo/core/index.js")
HARNESS = Path(__file__).resolve().parent.parent / "tools" / "node_eval.mjs"

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not BUNDLE.exists(),
    reason="node or reference bundle unavailable",
)

# JS throw message -> our error code
_MSG_TO_CODE = {
    "不是DATA模式": oracle.E_NOT_DATA_MODE,
    "单标签不合法": oracle.E_ILLEGAL_SELF_CLOSE,
    "标签不匹配": oracle.E_TAG_MISMATCH,
}


def _normalize_py(node):
    """Oracle AST -> the shape JSON.stringify produces for the JS AST
    (undefined attr values are dropped by JSON.stringify)."""
    out = {}
    for k, v in node.items():
        if k == "children":
            out[k] = [_normalize_py(c) for c in v]
        elif k == "attrs":
            out[k] = [
                {"name": a["name"]} if a["value"] is None
                else {"name": a["name"], "value": a["value"]}
                for a in v
            ]
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def node_results():
    cases = [f for f in FIXTURES if f[3] != DIVERGENT]
    proc = subprocess.run(
        ["node", str(HARNESS)],
        input=json.dumps([f[2] for f in cases]),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    return {f[0]: r for f, r in zip(cases, json.loads(proc.stdout))}


@pytest.mark.parametrize(
    "fixture_id,category,html,expected_status",
    [f for f in FIXTURES if f[3] != DIVERGENT],
    ids=[f[0] for f in FIXTURES if f[3] != DIVERGENT],
)
def test_oracle_matches_node(fixture_id, category, html, expected_status, node_results):
    ref = node_results[fixture_id]
    if expected_status == "ok":
        if (
            ref["status"] == "throw"
            and ref.get("error_type") == "RangeError"
            and category == "deep_nesting"
        ):
            # The reference's recursive parseChildren overflows the JS call
            # stack on deep documents (SURVEY.md §4.1). Our iterative build is
            # an intentional, mandated divergence: the oracle must still parse.
            res = oracle.parse_and_extract(html)
            assert res.status == "ok"
            return
        assert ref["status"] == "ok", f"reference threw: {ref}"
        root = oracle.parse_html(html)
        assert _normalize_py(root) == ref["ast"]
    else:
        assert ref["status"] == "throw", f"reference did not throw: {ref}"
        res = oracle.parse_and_extract(html)
        assert res.status == oracle.STATUS_ERROR
        if ref["error_type"] == "TypeError":
            assert res.error in (oracle.E_CDATA_UNCLOSED, oracle.E_INTERP_UNCLOSED)
        else:
            assert res.error == _MSG_TO_CODE[ref["message"]]


def test_divergent_fixtures_flagged_not_hung():
    """The reference loops forever on these (verified with timeouts); the
    oracle must classify them as divergent instantly."""
    for fixture_id, _cat, html, status in FIXTURES:
        if status != DIVERGENT:
            continue
        res = oracle.parse_and_extract(html)
        assert res.status == oracle.STATUS_DIVERGENT, fixture_id
        assert res.error == oracle.E_DIVERGENT


def test_deep_nesting_beyond_reference_limit():
    """The reference stack-overflows near depth ~5000; the iterative oracle
    must handle far deeper documents."""
    d = 100_000
    res = oracle.parse_and_extract("<d>" * d + "x" + "</d>" * d)
    assert res.status == "ok"
    assert res.spans == [("text", "x", None)]


def test_generate_quirks():
    """generate.ts quirks: paired close for voids, dropped comment/CDATA/
    interpolation, 'undefined' for missing attr values."""
    root = oracle.parse_html('<img src="x"/><p a="">t<!-- c -->{{ i }}</p>')
    assert oracle.generate(root) == '<img src="x"></img><p a="undefined">t</p>'
