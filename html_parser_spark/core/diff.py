"""Reference-exact port of the BFS positional tree diff
(packages/transform/transformDiff.ts:13-171 + core/tokenize.ts:184-209).

The contract is the reference's ACTUAL executed behavior (the compiled bundle
— validated in tests/test_diff_vs_node.py), NOT its committed test
expectations: `insert`'s findIndex-miss -> splice(-1, 1, x) replaces the LAST
child (transformDiff.ts:154-171), which clobbers a just-inserted <del> with
the <ins> whenever both target the same parent (SURVEY.md §5.2).

Semantics preserved exactly:
  - BFS lockstep over two queues (transformDiff.ts:26-76); pairing is
    POSITIONAL in BFS order, not structural.
  - parentMap keyed by node id; both trees' ids start at 1 (the parser
    resets the counter per parse), so parentMap[oldNode.id] resolves "the
    NEW node with the same numeric id" (transformDiff.ts:31-35).
  - Wrapper ids continue a global counter (CONFIG.idx). IMPORTANT: the
    reference has TWO behaviors here. The TS SOURCE shares one CONFIG with
    the parser, so after the canonical invocation (parse old, parse new,
    transform — as the jest suite does) wrappers continue from
    max_id(new_tree) + 1; that is THIS ENGINE's deterministic contract
    (diff_pair). The DEMO BUNDLE however carries an esbuild-duplicated
    CONFIG in transform/index.js (starts at 1, never reset), making its
    output depend on every prior transform call in the process — validation
    against the bundle therefore runs one pair per fresh process with
    idx_start=1 (tools/node_diff_single.mjs; tests/test_diff_fuzz_vs_node.py).
  - Text nodes compared by content; Elements by tagName (equal tags get
    diffAttributes annotation only — not serialized); Comment / CDATA /
    Interpolation are never compared ("no modify" branch).
  - A drifted queue pairing whose insert() hits an undefined container
    raises TypeError in JS -> DiffTypeError here (status 'error').
"""

from __future__ import annotations

from collections import deque
from typing import Any, Optional

from .oracle import CDATA, COMMENT, ELEMENT, INTERPOLATION, ROOT, TEXT

E_DIFF_TYPE_ERROR = "diff_type_error"  # JS TypeError inside insert()

DIFF_ADDED = 0
DIFF_REMOVED = 1


class DiffTypeError(Exception):
    """Models the reference throwing TypeError (undefined container)."""


def max_id(root: dict[str, Any]) -> int:
    m = root["id"]
    stack = [root]
    while stack:
        n = stack.pop()
        if n["id"] > m:
            m = n["id"]
        stack.extend(n.get("children") or ())
    return m


def transform_diff(
    new_root: dict[str, Any],
    old_root: dict[str, Any],
    idx_start: int,
    old_attrs: Optional[list[dict[str, Any]]] = None,
    new_attrs: Optional[list[dict[str, Any]]] = None,
) -> dict[str, Any]:
    """Mutates new_root per the reference plugin; returns it.

    new_root is `ast`, old_root is `context.diffAst` (transformDiff.ts:22).
    """
    old_attrs = old_attrs or []
    new_attrs = new_attrs or []
    parent_map: dict[int, dict[str, Any]] = {}
    idx = idx_start

    def create_wrapper(node: dict[str, Any], diff_type: int) -> dict[str, Any]:
        # createInsNode / createDelNode (tokenize.ts:184-209)
        nonlocal idx
        wrapper = {
            "id": idx,
            "type": ELEMENT,
            "tagName": "ins" if diff_type == DIFF_ADDED else "del",
            "attrs": list(new_attrs if diff_type == DIFF_ADDED else old_attrs),
            "children": [node],
            "pid": node["pid"],
            # engine-side marker (not part of reference semantics; generate
            # ignores it): lets consumers count SURVIVING wrappers exactly
            "__wrapper__": True,
        }
        idx += 1
        node["pid"] = wrapper["id"]
        return wrapper

    def add_diff_type(node: dict[str, Any], diff_type: int) -> dict[str, Any]:
        # addDiffType (transformDiff.ts:127-136)
        node["diffType"] = diff_type
        wrapper = create_wrapper(node, diff_type)
        if wrapper["id"] in parent_map:  # id collision with a visited new node
            parent_map[wrapper["id"]] = wrapper
        return wrapper

    def insert(node: dict[str, Any], container, anchor) -> None:
        # insert (transformDiff.ts:154-171) — all quirks preserved
        if anchor is not None:
            if container is None:
                raise DiffTypeError()  # JS: undefined.children -> TypeError
            children = container.get("children")
            if children is None:
                # container is a leaf (Text etc.): JS container.children is
                # undefined -> undefined.findIndex throws TypeError
                raise DiffTypeError()
            i = next((k for k, c in enumerate(children) if c is anchor), -1)
            if i == -1:
                # splice(-1, 1, node): replaces the LAST element
                if children:
                    children[-1] = node
                else:
                    children.append(node)  # splice on empty appends
            else:
                children[i] = node
        elif container is not None:
            if container.get("children") is not None:
                container["children"].append(node)
            else:
                container_parent = parent_map.get(container["pid"])
                if container_parent is not None and container_parent.get("children") is not None:
                    container_parent["children"].append(node)

    def diff_attributes(old_node, new_node) -> None:
        # diffAttributes (transformDiff.ts:84-125); annotation only
        old_a, new_a = old_node.get("attrs") or [], new_node.get("attrs") or []
        removed = [a for a in old_a if not any(b["name"] == a["name"] for b in new_a)]
        added = [a for a in new_a if not any(b["name"] == a["name"] for b in old_a)]
        updated = []
        for oa in old_a:
            na = next((b for b in new_a if b["name"] == oa["name"]), None)
            if na is not None and na["value"] != oa["value"]:
                updated.append(na)
        if added or removed or updated:
            d = {"added": added, "removed": removed, "updated": updated}
            old_node["diffAttributes"] = d
            new_node["diffAttributes"] = d

    old_q: deque = deque([old_root])
    new_q: deque = deque([new_root])
    while old_q or new_q:
        old_node = old_q.popleft() if old_q else None
        new_node = new_q.popleft() if new_q else None

        if new_node is not None:
            parent_map[new_node["id"]] = new_node
        new_parent = parent_map.get(new_node["pid"]) if new_node is not None else None
        old_parent = parent_map.get(old_node["pid"]) if old_node is not None else None
        old_to_new = parent_map.get(old_node["id"]) if old_node is not None else None

        if old_node is not None and new_node is not None:
            if old_node["type"] == new_node["type"]:  # isEqualElementType
                if old_node["type"] == TEXT:
                    if old_node["content"] != new_node["content"]:
                        insert(add_diff_type(old_node, DIFF_REMOVED), old_parent, old_to_new)
                        insert(add_diff_type(new_node, DIFF_ADDED), new_parent, new_node)
                elif old_node["type"] == ELEMENT:
                    if old_node["tagName"] != new_node["tagName"]:
                        insert(add_diff_type(old_node, DIFF_REMOVED), old_parent, old_to_new)
                        insert(add_diff_type(new_node, DIFF_ADDED), new_parent, new_node)
                    else:
                        diff_attributes(old_node, new_node)
                # Root/Comment/CDATA/Interpolation: "no modify"
            else:
                insert(add_diff_type(old_node, DIFF_REMOVED), old_parent, old_to_new)
                insert(add_diff_type(new_node, DIFF_ADDED), new_parent, new_node)
        elif old_node is not None:
            insert(add_diff_type(old_node, DIFF_REMOVED), old_parent, old_to_new)
        elif new_node is not None:
            insert(add_diff_type(new_node, DIFF_ADDED), new_parent, new_node)

        if old_node is not None and (
            (old_node["type"] == ELEMENT and not old_node.get("unary"))
            or old_node["type"] == ROOT
        ):
            old_q.extend(old_node.get("children") or ())
        if new_node is not None and (
            (new_node["type"] == ELEMENT and not new_node.get("unary"))
            or new_node["type"] == ROOT
        ):
            new_q.extend(new_node.get("children") or ())

    return new_root


def generate_iter(root: dict[str, Any]) -> str:
    """Iterative equivalent of oracle.generate (generate.ts:3-30) — same
    quirks (paired close tags for voids, '' for Comment/CDATA/Interpolation,
    'undefined' attr values), but immune to deep-tree recursion limits."""
    parts: list[str] = []
    # stack of (node, phase) — phase 0: open, 1: close
    stack: list[tuple[dict[str, Any], int]] = [(root, 0)]
    while stack:
        node, phase = stack.pop()
        t = node["type"]
        if phase == 1:
            parts.append(f"</{node['tagName']}>")
            continue
        if t == TEXT:
            parts.append(node["content"])
        elif t == ELEMENT:
            attrs = node.get("attrs") or []
            a = (
                " " + " ".join(
                    f'{x["name"]}="{"undefined" if x["value"] is None else x["value"]}"'
                    for x in attrs
                )
                if attrs
                else ""
            )
            parts.append(f"<{node['tagName']}{a}>")
            stack.append((node, 1))
            for c in reversed(node.get("children") or ()):
                stack.append((c, 0))
        elif t == ROOT:
            for c in reversed(node.get("children") or ()):
                stack.append((c, 0))
        # Comment/CDATA/Interpolation -> '' (undefined elided by join)
    return "".join(parts)


def diff_pair(
    new_html: str,
    old_html: str,
    old_attrs: Optional[list[dict[str, Any]]] = None,
    new_attrs: Optional[list[dict[str, Any]]] = None,
) -> tuple[Optional[str], str, Optional[str]]:
    """End-to-end pair diff -> (diff_html, status, error).

    Mirrors the reference call shape (transform.spec.js:8-13): parse OLD
    first, NEW second (so wrapper ids continue from after the new parse),
    then transform(new, diffAst=old) and serialize. Parse failures surface
    with the failing side's status; the reference's in-diff TypeError
    surfaces as error='diff_type_error'."""
    from .oracle import Divergence, ParseError, parse_html

    try:
        old_root = parse_html(old_html)
        new_root = parse_html(new_html)
    except Divergence:
        from .oracle import E_DIVERGENT, STATUS_DIVERGENT

        return None, STATUS_DIVERGENT, E_DIVERGENT
    except ParseError as e:
        return None, "error", e.code
    idx_start = max_id(new_root) + 1
    try:
        transform_diff(new_root, old_root, idx_start, old_attrs, new_attrs)
    except DiffTypeError:
        return None, "error", E_DIFF_TYPE_ERROR
    return generate_iter(new_root), "ok", None


def collect_diff_attributes(
    root: dict[str, Any],
) -> list[tuple[int, dict[str, list]]]:
    """(node_id, {added, removed, updated}) for every node in the transformed
    tree carrying a diffAttributes annotation, in document (DFS pre-)order.

    This surfaces diffAttributes (transformDiff.ts:84-125) as queryable
    output — the reference computes the annotation but never serializes it
    (generate ignores unknown keys), so a diff consumer cannot otherwise see
    added/removed/updated attrs. The dump is defined over the FINAL new tree:
    equal-tag element pairs annotate the surviving new node exactly once."""
    out: list[tuple[int, dict[str, list]]] = []
    stack = [root]
    while stack:
        node = stack.pop()
        d = node.get("diffAttributes")
        if d is not None:
            out.append((node["id"], d))
        stack.extend(reversed(node.get("children") or ()))
    return out


def count_wrappers(root: dict[str, Any]) -> tuple[int, int]:
    """(n_ins, n_del) surviving wrapper elements in a transformed tree."""
    n_ins = n_del = 0
    stack = [root]
    while stack:
        node = stack.pop()
        if node.get("__wrapper__"):
            if node["tagName"] == "ins":
                n_ins += 1
            else:
                n_del += 1
        stack.extend(node.get("children") or ())
    return n_ins, n_del
