"""Span-stream transform pipeline — the reference's plugin system
(SURVEY.md §2 X1-X3: transform/callNodeTransforms/traverseNode) re-expressed
Spark-first.

The reference runs an enter/exit plugin protocol over a mutable tree
(transform.ts:12-88); on Spark, plugin *composition* belongs to the driver
(each stage is a DataFrame op — SURVEY.md §2.2), and per-document rewrites
operate on the extracted span stream inside ONE mapInPandas stage. A plugin
is `list[Span] -> list[Span]` (Span = {kind,text,media_ref,order}); plugins
compose in registry order; `order` is reassigned after the chain so the
output invariant (dense 0-based document order) always holds.

Built-in plugins cover the common training-data rewrites; `directiveTransforms`
from the reference is declared-but-unused there (transform.ts:26-31) and has
no equivalent here by design.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterator, Sequence

from pyspark.sql import DataFrame

from .extract import EXTRACT_SCHEMA

Span = dict  # {kind, text, media_ref, order}
SpanPlugin = Callable[[list[Span]], list[Span]]


# --- built-in plugins -------------------------------------------------------

def drop_empty_text() -> SpanPlugin:
    def plugin(spans: list[Span]) -> list[Span]:
        return [
            s for s in spans
            if not (s["kind"] == "text" and (s["text"] is None or s["text"].strip() == ""))
        ]

    return plugin


def drop_kind(kind: str) -> SpanPlugin:
    def plugin(spans: list[Span]) -> list[Span]:
        return [s for s in spans if s["kind"] != kind]

    return plugin


def truncate_spans(max_spans: int) -> SpanPlugin:
    def plugin(spans: list[Span]) -> list[Span]:
        return spans[:max_spans]

    return plugin


def truncate_chars(max_chars: int) -> SpanPlugin:
    """Cap cumulative text length (hard doc-size cap for training corpora)."""

    def plugin(spans: list[Span]) -> list[Span]:
        out, budget = [], max_chars
        for s in spans:
            if s["kind"] == "text" and s["text"] is not None:
                if budget <= 0:
                    continue
                t = s["text"]
                if len(t) > budget:
                    s = {**s, "text": t[:budget]}
                budget -= len(s["text"])
            out.append(s)
        return out

    return plugin


def regex_redact(pattern: str, repl: str = "■") -> SpanPlugin:
    """Redact matches in text spans (PII-scrub-style rewrite)."""
    rx = re.compile(pattern)

    def plugin(spans: list[Span]) -> list[Span]:
        return [
            {**s, "text": rx.sub(repl, s["text"])}
            if s["kind"] == "text" and s["text"] is not None
            else s
            for s in spans
        ]

    return plugin


# --- the pipeline stage -----------------------------------------------------

def transform_spans(
    df_extracted: DataFrame, plugins: Sequence[SpanPlugin]
) -> DataFrame:
    """Apply the plugin chain per document (same output schema as
    extract_spans; n_spans/n_text_chars recomputed; error rows pass through
    untouched — plugins only see successful extractions)."""
    plugins = list(plugins)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            new_spans, n_spans_l, n_chars_l = [], [], []
            for spans, status in zip(pdf["spans"], pdf["status"]):
                if status != "ok" or spans is None:
                    spans = list(spans) if spans is not None else []
                else:
                    spans = [dict(s) for s in spans]
                    for p in plugins:
                        spans = p(spans)
                    for i, s in enumerate(spans):  # reassign dense order
                        s["order"] = i
                new_spans.append(spans)
                n_spans_l.append(len(spans))
                n_chars_l.append(
                    sum(len(s["text"]) for s in spans
                        if s["kind"] == "text" and s["text"] is not None)
                )
            out = pdf.copy()
            out["spans"] = new_spans
            out["n_spans"] = pd.array(n_spans_l, dtype="int32")
            out["n_text_chars"] = pd.array(n_chars_l, dtype="int64")
            yield out

    return df_extracted.mapInPandas(kernel, schema=EXTRACT_SCHEMA)
