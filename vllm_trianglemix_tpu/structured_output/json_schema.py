"""JSON-Schema / free-form JSON -> regex translation.

The outlines-style approach (schema compiled to a regular expression that
the DFA engine consumes). Supports the schema subset that covers the vast
majority of guided_json usage: type string/integer/number/boolean/null,
enum, const, object (properties + required, fixed key order), array
(items, minItems/maxItems), anyOf/oneOf, nested objects/arrays. Free-form
JSON ("json_object" response format) is produced by expanding the value
grammar to a bounded nesting depth.
"""

from __future__ import annotations

import re
from typing import Any

WS = r"[ \t\n\r]*"
STRING = r'"([^"\\\x00-\x1f]|\\(["\\/bfnrt]|u[0-9a-fA-F]{4}))*"'
INTEGER = r"-?(0|[1-9]\d*)"
NUMBER = r"-?(0|[1-9]\d*)(\.\d+)?([eE][-+]?\d+)?"
BOOLEAN = r"(true|false)"
NULL = r"null"


def _escape_literal(s: str) -> str:
    return re.escape(s)


def _json_const(value: Any) -> str:
    import json as _json

    return _escape_literal(_json.dumps(value))


def free_json_regex(depth: int = 4) -> str:
    """Any-JSON value grammar expanded to a bounded nesting depth
    (regexes can't recurse; depth 4 covers practical outputs)."""
    scalar = f"({STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
    value = scalar
    for _ in range(depth):
        members = f"{STRING}{WS}:{WS}{value}" \
            f"({WS},{WS}{STRING}{WS}:{WS}{value})*"
        obj = r"\{" + WS + f"({members})?" + WS + r"\}"
        items = f"{value}({WS},{WS}{value})*"
        arr = r"\[" + WS + f"({items})?" + WS + r"\]"
        value = f"({scalar}|{obj}|{arr})"
    return value


class SchemaError(ValueError):
    pass


def _resolve_ref(ref: str, root: Any) -> Any:
    """JSON-pointer resolution within the document ("#", "#/$defs/x",
    "#/definitions/x/y", reference: outlines/xgrammar $ref handling)."""
    if not ref.startswith("#"):
        raise SchemaError(f"only local $refs supported: {ref!r}")
    node = root
    for part in ref[1:].strip("/").split("/"):
        if not part:
            continue
        part = part.replace("~1", "/").replace("~0", "~")
        if not isinstance(node, dict) or part not in node:
            raise SchemaError(f"unresolvable $ref {ref!r}")
        node = node[part]
    return node


def schema_to_regex(schema: Any, depth: int = 8, root: Any = None) -> str:
    """Translate a JSON schema to a regex over its serialized form.

    Recursive schemas ($ref back into themselves, directly or via
    $defs/definitions) are unrolled up to ``depth`` levels; recursive
    alternatives inside anyOf/oneOf and OPTIONAL recursive object
    properties are pruned at the depth limit, so self-referential
    list/tree schemas terminate with their non-recursive base cases."""
    if root is None:
        root = schema
    if depth <= 0:
        raise SchemaError("schema nesting too deep")
    if schema in (True, {}):
        return free_json_regex()
    if not isinstance(schema, dict):
        raise SchemaError(f"unsupported schema: {schema!r}")

    if "$ref" in schema:
        return schema_to_regex(_resolve_ref(schema["$ref"], root),
                               depth - 1, root)
    if "const" in schema:
        return _json_const(schema["const"])
    if "enum" in schema:
        return "(" + "|".join(_json_const(v) for v in schema["enum"]) + ")"
    if "anyOf" in schema or "oneOf" in schema:
        subs = schema.get("anyOf") or schema.get("oneOf")
        parts, errs = [], []
        for sub in subs:
            try:
                parts.append(schema_to_regex(sub, depth - 1, root))
            except SchemaError as e:  # prune recursive arms at the limit
                errs.append(e)
        if not parts:
            raise errs[0]
        return "(" + "|".join(parts) + ")"

    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            schema_to_regex(dict(schema, type=one), depth - 1, root)
            for one in t) + ")"
    if t == "string":
        if "pattern" in schema:
            # Embed the user pattern between quotes (best-effort: the
            # pattern must not itself match quotes).
            return f'"{schema["pattern"]}"'
        return STRING
    if t == "integer":
        return INTEGER
    if t == "number":
        return NUMBER
    if t == "boolean":
        return BOOLEAN
    if t == "null":
        return NULL
    if t == "array":
        item = schema_to_regex(schema.get("items", {}), depth - 1, root)
        min_items = schema.get("minItems", 0)
        max_items = schema.get("maxItems")
        one = f"{item}"
        if max_items is None:
            if min_items == 0:
                body = f"({one}({WS},{WS}{one})*)?"
            else:
                body = (f"{one}" + f"({WS},{WS}{one})" + "{"
                        + str(min_items - 1) + ",}")
        else:
            if min_items == 0:
                body = (f"({one}({WS},{WS}{one})" + "{0,"
                        + str(max_items - 1) + "})?")
            else:
                body = (f"{one}({WS},{WS}{one})" + "{"
                        + str(min_items - 1) + "," + str(max_items - 1)
                        + "}")
        return r"\[" + WS + body + WS + r"\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        required = set(schema.get("required", list(props)))
        if not props:
            # free-form object
            members = f"{STRING}{WS}:{WS}{free_json_regex(2)}"
            return (r"\{" + WS
                    + f"({members}({WS},{WS}{members})*)?" + WS + r"\}")
        # Fixed declared key order (standard guided-json behavior).
        parts = []
        for key, sub in props.items():
            try:
                member = (f'"{_escape_literal(key)}"'
                          f"{WS}:{WS}{schema_to_regex(sub, depth - 1, root)}")
            except SchemaError:
                if key in required:
                    raise
                continue  # prune optional recursive property at the limit
            parts.append((member, key in required))
        if not any(req for _, req in parts):
            # All-optional object: any subset of members in any order
            # (comma-correct subset-in-declared-order is not regular in a
            # compact form; accept the looser any-order member set).
            member_alt = "(" + "|".join(m for m, _ in parts) + ")"
            return (r"\{" + WS
                    + f"({member_alt}({WS},{WS}{member_alt})*)?"
                    + WS + r"\}")
        # At least one required member: optional members attach with their
        # leading comma; an optional member before the first required one
        # is treated as required (documented approximation).
        segs = []
        seen_required = False
        for member, req in parts:
            if not segs:
                segs.append(member)
                seen_required = True  # first member emitted bare
                continue
            seg = f"{WS},{WS}{member}"
            if not req and seen_required:
                seg = f"({seg})?"
            segs.append(seg)
        return r"\{" + WS + "".join(segs) + WS + r"\}"
    raise SchemaError(f"unsupported schema: {schema!r}")
