"""Reference-exact oracle parser.

A pure-Python (stdlib-only) port of the reference semantics
(790891601/html-parser, /root/reference/packages/core/) used as the
correctness oracle for the Spark kernels. Every quirk below was verified by
executing the reference's compiled bundle (demo/core/index.js) under Node 20:

- No entity decoding; tag case preserved; whitespace-only text kept.
- Attributes (tokenize.ts:107): valueless attrs dropped; hyphenated names
  truncated to the last ``\\w+`` run before ``=``; quoted-empty value
  (``a=""``) -> undefined (None here); UNQUOTED-empty value (``a=``) -> ``""``
  (JS ``m[2]||m[3]||m[4]`` returns the last operand when all falsy).
- CDATA closes at ``]]`` not ``]]>`` (tokenize.ts:163); an unterminated CDATA
  or interpolation crashes the reference with a TypeError -> status 'error'.
- A text position whose SECOND character is ``/`` (and first is not ``<``)
  throws ``不是DATA模式`` (tokenize.ts:32-34, operator precedence:
  ``RCDATA || (DATA && source[1]==='/')``) -> error 'not_data_mode'.
  Verified: '<p>a/b</p>' throws, '<p>ab/c</p>' parses.
- Self-close on a non-void tag throws ``单标签不合法`` (tokenize.ts:76-79);
  the void list is case-sensitive ('<IMG/>' throws).
- End-tag mismatch (incl. unslashed '<br>') throws ``标签不匹配``
  (htmlParser.ts:82-94); unclosed elements at EOF are silently kept.
- Non-terminating inputs (the reference loops forever): parseText matching
  empty (source starting with '>' / '<!' not '<!--' / '<' + non-ASCII-alpha
  where tag regex fails), elementRE never matching ('<div' or '</div' at
  EOF). These become status 'divergent' here (error
  'divergent_nontermination'), never a hang.
- End-tag tokens carry NO id (tokenize.ts:88-92), so node ids = 1 (root) then
  creation order of all non-end tokens.

Span-extraction semantics (SURVEY.md §2.1): in-order traversal under
``generate``'s visibility rules (generate.ts:3-16): every Text node emits
``(kind='text', text=content, media_ref=None)``; every Element whose tagName
is in MEDIA_TAGS (img/source/embed/track) emits ``(kind='media', text=None,
media_ref=<first 'src' attr value>)`` before its children; Comment / CDATA /
Interpolation emit nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from .jsre import (
    ATTR_RE,
    CDATA_RE,
    ELEMENT_RE,
    INTERP_RE,
    MEDIA_TAGS,
    TEXT_RE,
    UNARY_TAGS,
    is_ascii_alpha,
)

# Token / node type tags. Tag states are the reference's TagState ints
# (types.ts:14-21); node kinds are the reference's string enum (types.ts:28-35).
TAG_OPEN = 1
TAG_NAME = 2
TAG_END = 4

ROOT = "Root"
ELEMENT = "Element"
TEXT = "Text"
COMMENT = "Comment"
CDATA = "CDATA"
INTERPOLATION = "Interpolation"

# Error codes (stable strings surfaced in the `error` output column).
E_NOT_DATA_MODE = "not_data_mode"            # tokenize.ts:34  不是DATA模式
E_ILLEGAL_SELF_CLOSE = "illegal_self_close"  # tokenize.ts:78  单标签不合法
E_TAG_MISMATCH = "tag_mismatch"              # htmlParser.ts:86,92  标签不匹配
E_CDATA_UNCLOSED = "cdata_unclosed"          # tokenize.ts:164 TypeError
E_INTERP_UNCLOSED = "interpolation_unclosed"  # tokenize.ts:175 TypeError
E_DIVERGENT = "divergent_nontermination"     # reference loops forever

STATUS_OK = "ok"
STATUS_ERROR = "error"
STATUS_DIVERGENT = "divergent"


class ParseError(Exception):
    def __init__(self, code: str):
        super().__init__(code)
        self.code = code


class Divergence(Exception):
    """The reference would never terminate on this input."""


def parse_attributes(attrs_str: str) -> list[dict[str, Any]]:
    """Port of parseAttributes (tokenize.ts:103-120)."""
    out = []
    for m in ATTR_RE.finditer(attrs_str):
        # JS: match[2] || match[3] || match[4] — Python `or` has the same
        # "last operand if all falsy" semantics (None/'' are falsy).
        value = m.group(2) or m.group(3) or m.group(4)
        out.append({"name": m.group(1), "value": value})
    return out


def tokenize(source: str) -> list[dict[str, Any]]:
    """Port of tokenize (tokenize.ts:7-55), offset-based (no string slicing).

    Raises ParseError for inputs the reference throws on, Divergence for
    inputs it loops forever on.
    """
    tokens: list[dict[str, Any]] = []
    s = source
    n = len(s)
    pos = 0
    cdata_mode = False
    next_id = 2  # id 1 is the synthetic root (htmlParser.ts:12-17)

    while pos < n:
        if not cdata_mode:
            if s.startswith("<![CDATA[", pos):
                cdata_mode = True
                continue
            tok: Optional[dict[str, Any]] = None
            c0 = s[pos]
            c1 = s[pos + 1] if pos + 1 < n else None
            if c0 == "<":
                if c1 == "!":
                    if s.startswith("<!--", pos):
                        # parseComment (tokenize.ts:140-161)
                        rest_idx = pos + 4
                        close = s.find("-->", rest_idx)
                        if close >= 0:
                            content = s[rest_idx:close]
                            pos = close + 3
                        else:
                            # unclosed: content = ENTIRE remaining source
                            # including '<!--'; consumes everything.
                            content = s[pos:]
                            pos = n
                        tok = {"id": next_id, "type": COMMENT, "content": content}
                        next_id += 1
                    # '<!' but not '<!--' (e.g. <!DOCTYPE): token stays None
                    # -> parseText matches '' -> reference hangs.
                elif c1 is None or is_ascii_alpha(c1):
                    # parseStartTag (tokenize.ts:58-86). c1 is None models the
                    # JS quirk /[a-zA-Z]/i.test(undefined) === true ('<' at EOF).
                    m = ELEMENT_RE.match(s, pos)
                    if m is None or m.group(2) is None:
                        # no elementRE match: the reference returns the token
                        # without advancing -> infinite loop.
                        raise Divergence()
                    tag_name = m.group(2)
                    attrs = parse_attributes(m.group(3))
                    self_close = m.group(4)
                    tok = {
                        "id": next_id,
                        "type": TAG_OPEN,
                        "tagName": tag_name,
                        "attrs": attrs,
                        "unary": False,
                    }
                    next_id += 1
                    if self_close:
                        if tag_name not in UNARY_TAGS:
                            raise ParseError(E_ILLEGAL_SELF_CLOSE)
                        tok["unary"] = True
                        tok["type"] = TAG_NAME
                    pos = m.end()
                elif c1 == "/":
                    # parseEndTag (tokenize.ts:88-101). NOTE: no id assigned.
                    m = ELEMENT_RE.match(s, pos)
                    if m is None:
                        raise Divergence()  # no advance -> infinite loop
                    # group(1) is the end-tag name; if the START alternative
                    # matched instead (e.g. '</di v>'), tagName stays
                    # undefined (None) and the tree phase throws 标签不匹配.
                    tok = {"type": TAG_END, "tagName": m.group(1)}
                    pos = m.end()
                # any other '<?' (e.g. '<1', '< ', '<<', '<>') -> token None
                # -> parseText '' -> reference hangs.
            elif c1 == "/":
                # tokenize.ts:32-34 — RCDATA || (DATA && source[1]==='/').
                raise ParseError(E_NOT_DATA_MODE)
            elif c0 == "{" and c1 == "{":
                # parseInterpolation (tokenize.ts:172-182)
                m = INTERP_RE.match(s, pos)
                if m is None:
                    raise ParseError(E_INTERP_UNCLOSED)  # TypeError in ref
                tok = {
                    "id": next_id,
                    "type": INTERPOLATION,
                    "content": [m.group(0), m.group(1)],
                }
                next_id += 1
                pos = m.end()
            if tok is None:
                # parseText (tokenize.ts:122-137)
                m = TEXT_RE.match(s, pos)
                content = m.group(0)
                if not content:
                    # empty match: reference pushes an empty text token
                    # without advancing -> infinite loop.
                    raise Divergence()
                tok = {"id": next_id, "type": TEXT, "content": content}
                next_id += 1
                pos = m.end()
            tokens.append(tok)
        else:
            # CDATA mode (tokenize.ts:44-51): source necessarily starts with
            # '<![CDATA[' (the toggle consumed nothing).
            m = CDATA_RE.match(s, pos)
            if m is None:
                raise ParseError(E_CDATA_UNCLOSED)  # TypeError in ref
            tokens.append({"id": next_id, "type": CDATA, "content": m.group(1)})
            next_id += 1
            pos = m.end()
            cdata_mode = False  # revertMode (constants.ts:19-21)

    return tokens


def build_tree(tokens: list[dict[str, Any]]) -> dict[str, Any]:
    """Iterative equivalent of HTMLParser.parseChildren (htmlParser.ts:36-119).

    The reference recurses (stack-overflows near depth ~5000); this builds the
    identical tree with an explicit parent stack.
    """
    root: dict[str, Any] = {"id": 1, "type": ROOT, "children": [], "pid": 0}
    stack = [root]
    cur = root
    for tok in tokens:
        t = tok["type"]
        if t == TAG_OPEN:
            node = dict(tok)
            node["pid"] = cur["id"]
            node["children"] = []
            node["type"] = ELEMENT
            cur["children"].append(node)
            stack.append(node)
            cur = node
        elif t == TAG_END:
            if len(stack) == 1:
                raise ParseError(E_TAG_MISMATCH)  # ancestors empty
            if stack[-1]["tagName"] == tok["tagName"]:
                stack.pop()
                cur = stack[-1]
            else:
                raise ParseError(E_TAG_MISMATCH)
        elif t == TAG_NAME:
            node = dict(tok)
            node["pid"] = cur["id"]
            node["type"] = ELEMENT
            cur["children"].append(node)
        else:
            node = dict(tok)
            node["pid"] = cur["id"]
            cur["children"].append(node)
    return root


def parse_html(source: str) -> dict[str, Any]:
    """Port of HTMLParser.parser (htmlParser.ts:10-35)."""
    return build_tree(tokenize(source))


@dataclass
class ParseResult:
    status: str = STATUS_OK
    error: Optional[str] = None
    root: Optional[dict[str, Any]] = None
    # extracted (kind, text, media_ref) triples, document order
    spans: list[tuple[str, Optional[str], Optional[str]]] = field(default_factory=list)


def _first_src(attrs: list[dict[str, Any]]) -> Optional[str]:
    for a in attrs:
        if a["name"] == "src":
            return a["value"]
    return None


def extract_spans(root: dict[str, Any]) -> list[tuple[str, Optional[str], Optional[str]]]:
    """In-order span extraction (SURVEY.md §2.1 extraction semantics)."""
    out: list[tuple[str, Optional[str], Optional[str]]] = []
    # iterative pre-order DFS preserving document order
    work = list(reversed(root["children"]))
    while work:
        node = work.pop()
        t = node["type"]
        if t == TEXT:
            out.append(("text", node["content"], None))
        elif t == ELEMENT:
            if node["tagName"] in MEDIA_TAGS:
                out.append(("media", None, _first_src(node["attrs"])))
            children = node.get("children")
            if children:
                work.extend(reversed(children))
        # Comment/CDATA/Interpolation: dropped (generate.ts:3-16 returns
        # undefined for them; join('') elides).
    return out


def parse_and_extract(source: str) -> ParseResult:
    """Parse one HTML string; never raises, never hangs."""
    try:
        root = parse_html(source)
    except Divergence:
        return ParseResult(status=STATUS_DIVERGENT, error=E_DIVERGENT)
    except ParseError as e:
        return ParseResult(status=STATUS_ERROR, error=e.code)
    return ParseResult(root=root, spans=extract_spans(root))


def generate(node: dict[str, Any]) -> Optional[str]:
    """Port of generate (generate.ts:3-30), quirks included: void elements
    get paired close tags ('<img ...></img>'), Comment/CDATA/Interpolation
    serialize as '', missing attr values serialize as the string 'undefined'.
    """
    t = node["type"]
    if t == ROOT:
        return _generate_children(node.get("children"))
    if t == ELEMENT:
        attrs = _generate_attrs(node.get("attrs"))
        children = _generate_children(node.get("children"))
        return f"<{node['tagName']}{attrs}>{children}</{node['tagName']}>"
    if t == TEXT:
        return node["content"]
    return None  # Comment/CDATA/Interpolation -> undefined in JS


def _generate_attrs(attrs) -> str:
    if not isinstance(attrs, list) or not attrs:
        return ""
    parts = []
    for a in attrs:
        v = a["value"]
        parts.append(f'{a["name"]}="{"undefined" if v is None else v}"')
    return " " + " ".join(parts)


def _generate_children(children) -> str:
    if not isinstance(children, list) or not children:
        return ""
    # JS join('') turns undefined into ''
    return "".join(g if (g := generate(c)) is not None else "" for c in children)


# ---------------------------------------------------------------------------
# Document-level processing over the interleaved input shape
# (doc_id, spans: array<struct<kind, text, media_ref, offset>>)
# ---------------------------------------------------------------------------

def process_document(
    input_spans: list[tuple[str, Optional[str], Optional[str]]],
) -> tuple[list[tuple[str, Optional[str], Optional[str], int]], str, Optional[str]]:
    """Process one interleaved document: media input spans pass through;
    text input spans are parsed and their extracted spans appended in order.

    On the first failing text span, processing stops: spans extracted from
    EARLIER input spans are kept, and (status, error) reflect the failure.
    Returns (out_spans_with_order, status, error).
    """
    out: list[tuple[str, Optional[str], Optional[str], int]] = []
    order = 0
    for kind, text, media_ref in input_spans:
        if kind == "media":
            out.append(("media", None, media_ref, order))
            order += 1
            continue
        res = parse_and_extract(text if text is not None else "")
        if res.status != STATUS_OK:
            return out, res.status, res.error
        for k, t, mr in res.spans:
            out.append((k, t, mr, order))
            order += 1
    return out, STATUS_OK, None
