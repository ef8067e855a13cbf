"""Seeded random fuzz DIRECTLY against the reference bundle: the Python
oracle's status classification and ASTs must match Node on inputs no fixture
anticipated. Divergence prediction is load-bearing here — a misclassified
'ok' would hang the Node batch (caught by the subprocess timeout)."""

from __future__ import annotations

import json
import random
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

sys.setrecursionlimit(100_000)

from html_parser_spark.core import oracle
from tests.test_oracle_vs_node import _MSG_TO_CODE, _normalize_py

BUNDLE = Path("/root/reference/demo/core/index.js")
HARNESS = Path(__file__).resolve().parent.parent / "tools" / "node_eval.mjs"

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not BUNDLE.exists(),
    reason="node or reference bundle unavailable",
)

ALPHABET = "<>/!{}-= \"'abPdiv[]CDATA&;汉\n."
N_CASES = 500


def _corpus():
    rng = random.Random(20260817)
    return ["".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 50)))
            for _ in range(N_CASES)]


def test_fuzz_against_bundle():
    cases = _corpus()
    predictions = [oracle.parse_and_extract(h) for h in cases]
    terminating = [
        (h, p) for h, p in zip(cases, predictions) if p.status != "divergent"
    ]
    # if any 'terminating' prediction is wrong, node hangs -> timeout fails loud
    proc = subprocess.run(
        ["node", str(HARNESS)],
        input=json.dumps([h for h, _ in terminating]),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[:500]
    results = json.loads(proc.stdout)
    n_ok = n_err = 0
    for (html, pred), ref in zip(terminating, results):
        if pred.status == "ok":
            n_ok += 1
            assert ref["status"] == "ok", (repr(html), ref)
            assert _normalize_py(oracle.parse_html(html)) == ref["ast"], repr(html)
        else:
            n_err += 1
            assert ref["status"] == "throw", (repr(html), ref)
            if ref["error_type"] == "TypeError":
                assert pred.error in (oracle.E_CDATA_UNCLOSED, oracle.E_INTERP_UNCLOSED)
            else:
                assert pred.error == _MSG_TO_CODE[ref["message"]], (repr(html), ref)
    # the corpus must genuinely exercise all three classes
    assert n_ok > 20 and n_err > 20 and len(terminating) < len(cases)


def test_sampled_divergents_actually_hang_reference():
    """Spot-check the divergence classifier the hard way: the bundle must NOT
    terminate within 2s on inputs we call divergent (per-case node process,
    killed on timeout)."""
    cases = [h for h in _corpus() if oracle.parse_and_extract(h).status == "divergent"]
    rng = random.Random(7)
    sample = rng.sample(cases, min(6, len(cases)))
    script = (
        "import('/root/reference/demo/core/index.js').then(m => {"
        "const p = new m.HTMLParser();"
        "p.parser(JSON.parse(process.argv[1]));"
        "console.log('TERMINATED'); })"
    )
    for html in sample:
        try:
            proc = subprocess.run(
                ["node", "-e", script, json.dumps(html)],
                capture_output=True,
                text=True,
                timeout=2,
            )
            # termination is only acceptable if it threw (not clean parse)
            assert "TERMINATED" not in proc.stdout, (
                f"classified divergent but reference parsed fine: {html!r}"
            )
        except subprocess.TimeoutExpired:
            pass  # expected: the reference loops forever
