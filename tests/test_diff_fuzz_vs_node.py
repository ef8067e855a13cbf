"""Random PAIR fuzz of the diff against the reference bundle in FRESH-PROCESS
single-pair mode (tools/node_diff_single.mjs).

Why fresh-process: esbuild duplicated the CONFIG module into the transform
bundle (demo/transform/index.js has its own `CONFIG = {idx: BigInt(1)}`,
never reset), so wrapper ids in a long-lived process depend on every prior
transform call — batch outputs are call-history-dependent and NOT a
per-pair oracle. A fresh process pins wrapper ids at 1..k, which maximally
stresses the parentMap id-collision path (`addDiffType`'s
parentMap[diffNode.id] overwrite); our port reproduces it with idx_start=1.
The ENGINE's contract (core/diff.diff_pair) uses the TS-source semantics
instead: one shared counter continuing from the parse of the new document —
the deterministic canonical invocation (parse old, parse new, transform),
matching how the reference's own jest suite drives it."""

from __future__ import annotations

import json
import random
import shutil
import subprocess
from pathlib import Path

import pytest

from html_parser_spark.core import oracle
from html_parser_spark.core.diff import DiffTypeError, generate_iter, transform_diff

BUNDLE = Path("/root/reference/demo/core/index.js")
HARNESS = Path(__file__).resolve().parent.parent / "tools" / "node_diff_single.mjs"

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not BUNDLE.exists(),
    reason="node or reference bundle unavailable",
)

TAGS = ["div", "p", "span", "b", "li"]
VOIDS = ["img", "br"]


def _doc(rng: random.Random, depth: int = 0) -> str:
    parts = []
    for _ in range(rng.randint(0, 3)):
        k = rng.randint(0, 4)
        if k == 0:
            parts.append(rng.choice(["a", "bb", "ccc", "d d", ""]))
        elif k == 1 and depth < 3:
            t = rng.choice(TAGS)
            parts.append(f"<{t}>{_doc(rng, depth + 1)}</{t}>")
        elif k == 2:
            v = rng.choice(VOIDS)
            attr = rng.choice(["", ' src="u"', " a=1"])
            parts.append(f"<{v}{attr}/>")
        elif k == 3:
            parts.append("<!-- c -->")
        else:
            parts.append("<x>y</x>")
    return "".join(parts)


def _pairs(n):
    rng = random.Random(20260818)
    docs = []
    while len(docs) < 2 * n:
        h = _doc(rng)
        if oracle.parse_and_extract(h).status == "ok":
            docs.append(h)
    pairs = list(zip(docs[:n], docs[n:]))
    pairs += [("<li><x>b</x><img a=1/></li>", ""), ("", "<li>b</li>")]  # drift cases
    return pairs


def _bundle_fresh(new_h: str, old_h: str) -> dict:
    proc = subprocess.run(
        ["node", str(HARNESS), json.dumps([new_h, old_h])],
        capture_output=True,
        text=True,
        timeout=20,
    )
    assert proc.returncode == 0, proc.stderr[:300]
    return json.loads(proc.stdout)


def _port_fresh(new_h: str, old_h: str):
    old_root = oracle.parse_html(old_h)
    new_root = oracle.parse_html(new_h)
    try:
        transform_diff(new_root, old_root, idx_start=1)
    except DiffTypeError:
        return None, "throw"
    return generate_iter(new_root), "ok"


def test_diff_fuzz_matches_fresh_bundle():
    n_ok = 0
    for new_h, old_h in _pairs(40):
        ref = _bundle_fresh(new_h, old_h)
        got, status = _port_fresh(new_h, old_h)
        if ref["status"] == "ok":
            assert status == "ok", (repr(new_h), repr(old_h))
            assert got == ref["html"], (repr(new_h), repr(old_h))
            n_ok += 1
        else:
            assert status == "throw", (repr(new_h), repr(old_h), ref, got)
    assert n_ok > 15
