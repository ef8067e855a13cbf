"""Vectorized extraction kernel: batched tokenize -> parent-stack span build.

This is the hot path that runs inside ``mapInArrow`` (one invocation per
Arrow batch). Per document it makes exactly two array passes:

  pass 1 — tokenize: one left-to-right scan producing flat, columnar token
           arrays (type / tag / payload), all character work done by compiled
           regexes at integer offsets (no string re-slicing — the reference's
           O(n²) ``advanceBy`` slicing, advance.ts:7, is replaced by cursor
           arithmetic);
  pass 2 — parent-stack build: a single walk over the token arrays with an
           explicit tag stack, emitting the ordered span sequence directly
           (the tree is never materialized — the id/pid tree is isomorphic to
           this stack walk, SURVEY.md §1.1).

Pass separation is REQUIRED for error parity: the reference tokenizes the
whole source before building the tree (htmlParser.ts:26-33), so a tokenizer
error late in the document must win over a tag-mismatch earlier in it.

Semantics are pinned to ``core.oracle`` (itself pinned to the reference
bundle); tests/test_kernel_vs_oracle.py asserts span-for-span equality.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from ..core.jsre import (
    ATTR_RE,
    CDATA_RE,
    ELEMENT_RE,
    INTERP_RE,
    MEDIA_TAGS,
    TEXT_RE,
    UNARY_TAGS,
)
from ..core.oracle import (
    E_CDATA_UNCLOSED,
    E_DIVERGENT,
    E_ILLEGAL_SELF_CLOSE,
    E_INTERP_UNCLOSED,
    E_NOT_DATA_MODE,
    E_TAG_MISMATCH,
    STATUS_DIVERGENT,
    STATUS_ERROR,
    STATUS_OK,
)

# Compact token type codes (pass-1 output arrays)
_T_TEXT = 0
_T_OPEN = 1
_T_VOID = 2
_T_END = 3
# emitted only with keep_all=True (full-parse consumers; the extraction walk
# never sees them — Comment/CDATA/Interpolation extract no spans)
_T_COMMENT = 4
_T_CDATA = 5
_T_INTERP = 6

# sentinel distinguishing "end tag matched the start-tag regex alternative"
# (tagName is JS undefined -> can never equal a real tag -> tag_mismatch)
_UNDEF = object()


@dataclass(frozen=True)
class ExtractOptions:
    """Extraction behavior flags.

    mode='strict' reproduces the reference's extraction exactly (the
    span-equality contract). mode='main' additionally applies the flag-gated
    main-content heuristics (script/style strip + density scoring) — see
    kernels/heuristics.py; heuristic output is NOT covered by the reference
    equality contract (SURVEY.md §2.1).
    """

    mode: str = "strict"
    parse_all_attrs: bool = False  # keep per-element attrs (diff/heuristics)


class _Fail(Exception):
    def __init__(self, status: str, error: str):
        self.status = status
        self.error = error


def _tokenize_arrays(
    s: str, want_attrs: bool, keep_all: bool = False
) -> tuple[list[int], list[Optional[str]], list[Any], list[Any]]:
    """Pass 1. Returns parallel arrays (types, tags, payloads, attrs).

    payloads: text content for _T_TEXT, src value for media _T_OPEN/_T_VOID.
    Raises _Fail on reference-throw/reference-hang inputs.

    keep_all=True additionally emits Comment/CDATA/Interpolation tokens
    (payload = comment content per tokenize.ts:140-161 incl. the
    unclosed-comment swallow-all, CDATA inner, raw interpolation match) for
    full-parse consumers; the extraction path leaves it False and skips them
    (they extract no spans), with zero cost on that hot path.
    """
    types: list[int] = []
    tags: list[Any] = []
    payloads: list[Any] = []
    attrs_col: list[Any] = []
    n = len(s)
    pos = 0
    # local bindings (hot loop)
    element_match = ELEMENT_RE.match
    text_match = TEXT_RE.match
    starts = s.startswith
    find = s.find

    while pos < n:
        c0 = s[pos]
        if c0 == "<":
            if starts("<![CDATA[", pos):
                # DATA->CDATA toggle + parseCDATA (tokenize.ts:15-18,44-51,162-171)
                m = CDATA_RE.match(s, pos)
                if m is None:
                    raise _Fail(STATUS_ERROR, E_CDATA_UNCLOSED)
                if keep_all:
                    types.append(_T_CDATA)
                    tags.append(None)
                    payloads.append(m.group(1))
                    if want_attrs:
                        attrs_col.append(None)
                pos = m.end()  # CDATA contributes no span, no stack effect
                continue
            c1 = s[pos + 1] if pos + 1 < n else None
            if c1 == "!":
                if starts("<!--", pos):
                    close = find("-->", pos + 4)
                    if keep_all:
                        types.append(_T_COMMENT)
                        tags.append(None)
                        # unclosed comment swallows the ENTIRE remaining
                        # source including '<!--' (tokenize.ts:140-161)
                        payloads.append(s[pos + 4 : close] if close >= 0 else s[pos:])
                        if want_attrs:
                            attrs_col.append(None)
                    pos = close + 3 if close >= 0 else n  # comment: no span
                    continue
                # '<!' not '<!--' (e.g. <!DOCTYPE): parseText matches '' ->
                # the reference loops forever (verified).
                raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
            if c1 is None or ("a" <= c1 <= "z") or ("A" <= c1 <= "Z"):
                # parseStartTag; c1 None == JS /[a-zA-Z]/i.test(undefined)
                m = element_match(s, pos)
                if m is None or m.group(2) is None:
                    raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)  # no advance
                tag = m.group(2)
                self_close = m.group(4)
                if self_close:
                    if tag not in UNARY_TAGS:
                        raise _Fail(STATUS_ERROR, E_ILLEGAL_SELF_CLOSE)
                    types.append(_T_VOID)
                else:
                    types.append(_T_OPEN)
                tags.append(tag)
                if tag in MEDIA_TAGS:
                    src = None
                    for am in ATTR_RE.finditer(m.group(3)):
                        if am.group(1) == "src":
                            src = am.group(2) or am.group(3) or am.group(4)
                            break
                    payloads.append(src)
                else:
                    payloads.append(None)
                if want_attrs:
                    attrs_col.append(
                        [
                            (am.group(1), am.group(2) or am.group(3) or am.group(4))
                            for am in ATTR_RE.finditer(m.group(3))
                        ]
                    )
                pos = m.end()
                continue
            if c1 == "/":
                m = element_match(s, pos)
                if m is None:
                    raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)  # no advance
                types.append(_T_END)
                g1 = m.group(1)
                tags.append(g1 if g1 is not None else _UNDEF)
                payloads.append(None)
                if want_attrs:
                    attrs_col.append(None)
                pos = m.end()
                continue
            # any other '<?': parseText matches '' -> hang
            raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
        # non-'<' position
        if pos + 1 < n and s[pos + 1] == "/":
            # tokenize.ts:32-34 quirk (operator precedence)
            raise _Fail(STATUS_ERROR, E_NOT_DATA_MODE)
        if c0 == "{" and pos + 1 < n and s[pos + 1] == "{":
            m = INTERP_RE.match(s, pos)
            if m is None:
                raise _Fail(STATUS_ERROR, E_INTERP_UNCLOSED)
            if keep_all:
                types.append(_T_INTERP)
                tags.append(None)
                payloads.append((m.group(0), m.group(1)))  # (raw, inner)
                if want_attrs:
                    attrs_col.append(None)
            pos = m.end()  # interpolation: no span
            continue
        m = text_match(s, pos)
        content = m.group(0)
        if not content:
            # '>' at pos: empty text token, no advance -> hang
            raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
        types.append(_T_TEXT)
        tags.append(None)
        payloads.append(content)
        if want_attrs:
            attrs_col.append(None)
        pos = m.end()

    return types, tags, payloads, attrs_col


def extract_doc_spans(
    html: str,
) -> tuple[list[tuple[str, Optional[str], Optional[str]]], str, Optional[str]]:
    """Extract the ordered (kind, text, media_ref) span sequence of one HTML
    string. Never raises, never hangs. Fast path for tag-free payloads.

    Fused single-pass variant of (_tokenize_arrays + parent-stack walk): the
    token arrays are never materialized on this hot path. Error precedence is
    preserved exactly (the reference tokenizes the WHOLE source before tree
    building, htmlParser.ts:26-33): a tokenizer throw/hang anywhere must win
    over an earlier tag mismatch, so on a tree error the scan CONTINUES
    (collecting nothing) until EOF or a tokenizer failure. Equality with the
    two-pass semantics is pinned by tests/test_kernel_vs_oracle.py and the
    hypothesis + node-bundle fuzz suites.
    """
    # Fast path: no markup metacharacters at all -> single text token.
    # ('/' excluded so the position-1 not_data_mode quirk can't fire,
    # '{'/'<'/'>' excluded so no other branch can trigger.)
    if html and not any(c in html for c in "<>{/"):
        return [("text", html, None)], STATUS_OK, None

    spans: list[tuple[str, Optional[str], Optional[str]]] = []
    stack: list[Any] = []
    tree_error = False  # first tag mismatch; finalized only at EOF
    s = html
    n = len(s)
    pos = 0
    element_match = ELEMENT_RE.match
    text_match = TEXT_RE.match
    starts = s.startswith
    find = s.find

    try:
        while pos < n:
            c0 = s[pos]
            if c0 == "<":
                if starts("<![CDATA[", pos):
                    m = CDATA_RE.match(s, pos)
                    if m is None:
                        raise _Fail(STATUS_ERROR, E_CDATA_UNCLOSED)
                    pos = m.end()
                    continue
                c1 = s[pos + 1] if pos + 1 < n else None
                if c1 == "!":
                    if starts("<!--", pos):
                        close = find("-->", pos + 4)
                        pos = close + 3 if close >= 0 else n
                        continue
                    raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
                if c1 is None or ("a" <= c1 <= "z") or ("A" <= c1 <= "Z"):
                    m = element_match(s, pos)
                    if m is None or m.group(2) is None:
                        raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
                    tag = m.group(2)
                    if m.group(4):  # self-closing
                        if tag not in UNARY_TAGS:
                            raise _Fail(STATUS_ERROR, E_ILLEGAL_SELF_CLOSE)
                        if not tree_error and tag in MEDIA_TAGS:
                            spans.append(("media", None, _first_src_attr(m.group(3))))
                    elif not tree_error:
                        if tag in MEDIA_TAGS:
                            spans.append(("media", None, _first_src_attr(m.group(3))))
                        stack.append(tag)
                    pos = m.end()
                    continue
                if c1 == "/":
                    m = element_match(s, pos)
                    if m is None:
                        raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
                    if not tree_error:
                        g1 = m.group(1)
                        if g1 is None or not stack or stack[-1] != g1:
                            tree_error = True  # keep scanning for tokenizer errors
                        else:
                            stack.pop()
                    pos = m.end()
                    continue
                raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
            if pos + 1 < n and s[pos + 1] == "/":
                raise _Fail(STATUS_ERROR, E_NOT_DATA_MODE)
            if c0 == "{" and pos + 1 < n and s[pos + 1] == "{":
                m = INTERP_RE.match(s, pos)
                if m is None:
                    raise _Fail(STATUS_ERROR, E_INTERP_UNCLOSED)
                pos = m.end()
                continue
            m = text_match(s, pos)
            content = m.group(0)
            if not content:
                raise _Fail(STATUS_DIVERGENT, E_DIVERGENT)
            if not tree_error:
                spans.append(("text", content, None))
            pos = m.end()
    except _Fail as f:
        return [], f.status, f.error

    if tree_error:
        return [], STATUS_ERROR, E_TAG_MISMATCH
    # unclosed elements at EOF are silently kept (htmlParser.ts:108-119)
    return spans, STATUS_OK, None


def _first_src_attr(attrs_str: str) -> Optional[str]:
    for am in ATTR_RE.finditer(attrs_str):
        if am.group(1) == "src":
            return am.group(2) or am.group(3) or am.group(4)
    return None


def process_document_flat(
    kinds: list[str],
    texts: list[Optional[str]],
    media_refs: list[Optional[str]],
    out_kinds: list[str],
    out_texts: list[Optional[str]],
    out_mrefs: list[Optional[str]],
) -> tuple[int, str, Optional[str], int]:
    """process_document, columnar form: append this document's extracted
    spans to the shared flat output lists (per-span order is the position
    within the document, i.e. 0..n-1 — the caller reconstructs it from the
    returned count). Returns (n_spans, status, error, n_text_chars).

    Same semantics as process_document (pinned by test_kernel_vs_oracle):
    on the first failing text span, earlier appended spans are KEPT and the
    status reflects the failure.
    """
    n0 = len(out_kinds)
    n_chars = 0
    for kind, text, mref in zip(kinds, texts, media_refs):
        if kind == "media":
            out_kinds.append("media")
            out_texts.append(None)
            out_mrefs.append(mref)
            continue
        spans, status, error = extract_doc_spans(text if text is not None else "")
        if status != STATUS_OK:
            return len(out_kinds) - n0, status, error, n_chars
        for k, t, mr in spans:
            out_kinds.append(k)
            out_texts.append(t)
            out_mrefs.append(mr)
            if t is not None:
                n_chars += len(t)
    return len(out_kinds) - n0, STATUS_OK, None, n_chars


def process_document(
    kinds: list[str],
    texts: list[Optional[str]],
    media_refs: list[Optional[str]],
) -> tuple[list[dict[str, Any]], str, Optional[str], int]:
    """Process one interleaved document (parallel input-span arrays).

    Returns (out_spans, status, error, n_text_chars); out_spans are dicts
    {kind, text, media_ref, order}. Mirrors oracle.process_document: on the
    first failing text span, earlier spans are kept and status reflects the
    failure.
    """
    out: list[dict[str, Any]] = []
    order = 0
    n_chars = 0
    for kind, text, mref in zip(kinds, texts, media_refs):
        if kind == "media":
            out.append({"kind": "media", "text": None, "media_ref": mref, "order": order})
            order += 1
            continue
        spans, status, error = extract_doc_spans(text if text is not None else "")
        if status != STATUS_OK:
            return out, status, error, n_chars
        for k, t, mr in spans:
            out.append({"kind": k, "text": t, "media_ref": mr, "order": order})
            if t is not None:
                n_chars += len(t)
            order += 1
    return out, STATUS_OK, None, n_chars
