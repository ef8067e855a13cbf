"""Compiled regexes reproducing the reference tokenizer's JS regex semantics.

The reference (790891601/html-parser) tokenizes with JavaScript regexes whose
character classes differ subtly from Python's defaults:

- JS ``\\s`` is the explicit set ``[\\t\\n\\v\\f\\r \\u00a0\\u1680\\u2000-\\u200a
  \\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff]`` (Python ``\\s`` omits U+FEFF and
  adds U+001C-001F/U+0085), so we spell the class out.
- JS ``\\w`` is ASCII ``[A-Za-z0-9_]`` (Python's is Unicode-aware), so we
  spell it out.
- JS ``.`` excludes ``\\n \\r \\u2028 \\u2029`` (Python ``.`` excludes only
  ``\\n``), relevant for the interpolation regex.

Reference patterns reproduced here:
- elementRE  -> packages/core/tokenize.ts:4
- attr regex -> packages/core/tokenize.ts:107
- text       -> packages/core/tokenize.ts:125  (``[^<>]*``)
- comment    -> packages/core/tokenize.ts:145  (``([\\s\\S]*?)(-->)``)
- CDATA      -> packages/core/tokenize.ts:163  (``<!\\[CDATA\\[([\\s\\S]*?)\\]\\]``
               — note: closed by ``]]``, NOT the standard ``]]>``)
- interp     -> packages/core/tokenize.ts:174  (``\\{\\{\\s*(.*?)\\s*\\}\\}``)

All patterns are compiled WITHOUT a leading ``^`` — callers use
``pattern.match(s, pos)`` which anchors at ``pos`` (a leading ``^`` would only
match at true string start).
"""

from __future__ import annotations

import re

# JS \s, spelled out (ECMA-262 WhiteSpace + LineTerminator, incl. U+FEFF).
JS_WS_CHARS = (
    " " + chr(9) + chr(10) + chr(11) + chr(12) + chr(13)
    + chr(0x00A0) + chr(0x1680)
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + chr(0x2028) + chr(0x2029) + chr(0x202F) + chr(0x205F) + chr(0x3000) + chr(0xFEFF)
)
_WS = re.escape(JS_WS_CHARS)

# JS ``.`` complement set (dot excludes these four).
_JS_DOT_EXCL = chr(10) + chr(13) + chr(0x2028) + chr(0x2029)


# elementRE (tokenize.ts:4), alternation order preserved:
#   \s*(?:  <\/\s*([^>\s\/]*)\s*>            -- group 1: end-tag name
#         | <([^>\s\/]*)\s*([^<>]*?)(\/?)>   -- groups 2,3,4: name, attrs, self-close
#   )
ELEMENT_RE = re.compile(
    "[" + _WS + "]*(?:"
    "</[" + _WS + "]*([^>" + _WS + "/]*)[" + _WS + "]*>"
    "|"
    "<([^>" + _WS + "/]*)[" + _WS + "]*([^<>]*?)(/?)>"
    ")"
)

# Attribute regex (tokenize.ts:107): /(\w+)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^>\s]*))/g
ATTR_RE = re.compile(
    "([A-Za-z0-9_]+)[" + _WS + "]*=[" + _WS + "]*"
    "(?:\"([^\"]*)\"|'([^']*)'|([^>" + _WS + "]*))"
)

# parseText (tokenize.ts:125): /[^<>]*/
TEXT_RE = re.compile("[^<>]*")

# parseCDATA (tokenize.ts:163): /^<!\[CDATA\[([\s\S]*?)\]\]/  — ']]' close, no '>'.
CDATA_RE = re.compile(r"<!\[CDATA\[([\s\S]*?)\]\]")

# parseInterpolation (tokenize.ts:174): /^\{\{\s*(.*?)\s*\}\}/
# JS '.' excludes \n \r     — content must be single-line, but the
# surrounding \s* may span lines (verified: '{{ a\nb }}' crashes the
# reference with TypeError; '{{\n a }}' parses).
INTERP_RE = re.compile(
    r"\{\{[" + _WS + "]*([^" + re.escape(_JS_DOT_EXCL) + "]*?)[" + _WS + r"]*\}\}"
)

# Void-element list (packages/core/utils/element.ts:3-20). Case-SENSITIVE
# membership (verified: '<IMG .../>' throws 单标签不合法).
UNARY_TAGS = frozenset(
    (
        "br", "hr", "img", "input", "meta", "link", "area", "base",
        "col", "command", "embed", "keygen", "param", "source", "track", "wbr",
    )
)

# Media tags for span extraction (the void elements that carry a media src;
# SURVEY.md §2.1 "extraction semantics").
MEDIA_TAGS = frozenset(("img", "source", "embed", "track"))


def is_ascii_alpha(ch: str) -> bool:
    """JS /[a-zA-Z]/i.test — ASCII letters only (Python str.isalpha is Unicode)."""
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z")
