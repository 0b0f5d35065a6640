"""Native JSON-schema constrained-decoding automaton.

The reference uses lm-format-enforcer's TokenEnforcer + JsonSchemaParser
(/root/reference/constraints.py:19-42); that dependency is unavailable here,
so this module implements the same idea from scratch:

1. a character-level pushdown parser for schema-constrained JSON (a stack of
   frames: object / array / string / number / literal), where each state
   exposes the set of allowed next characters,
2. a prefix trie over the tokenizer vocabulary,
3. allowed-token computation by walking the trie against the parser
   (a token is allowed iff every one of its characters is accepted), with a
   per-parser-state memo so each distinct automaton state pays the walk once.

Deliberate simplifications vs full JSON Schema (documented subset):
- canonical JSON is emitted: no whitespace between tokens,
- object properties appear in schema `properties` order and all listed
  properties are emitted (the reference's enforcer allows arbitrary subsets
  and orders),
- supported keywords: type (object/array/string/integer/number/boolean/null),
  properties, items, enum, const, minItems/maxItems; anything else means
  "any JSON value".

The scheduler turns allowed-token sets into additive device masks
(tpusgl/runtime/scheduler.py), fused into on-device sampling.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from tpusgl.runtime.constraints import ConstraintState

_DIGITS = "0123456789"
# Characters allowed inside a JSON string (unescaped) — printable minus " and \.
_STRING_CHARS = "".join(
    chr(c) for c in range(0x20, 0x7F) if chr(c) not in ('"', "\\")
)
_ESCAPABLE = '"\\/bfnrt'

ANY_SCHEMA: Dict[str, Any] = {}


# --------------------------------------------------------------------- frames
# Each frame is an immutable tuple: (kind, *state). The parser state is a
# tuple of frames (a stack); advancing a character returns a new stack or
# None if the character is illegal.


def _value_frames(schema: Dict[str, Any]) -> List[Tuple]:
    """Frames to push (top last) for a value conforming to `schema`."""
    if not isinstance(schema, dict):
        schema = ANY_SCHEMA
    if "const" in schema:
        import json as _json

        return [("lit", _json.dumps(schema["const"]))]
    if "enum" in schema:
        import json as _json

        options = tuple(_json.dumps(v) for v in schema["enum"])
        return [("enum", options, "")]
    t = schema.get("type")
    if t == "object" or (t is None and "properties" in schema):
        props = tuple(
            (k, _freeze(v)) for k, v in (schema.get("properties") or {}).items()
        )
        return [("obj_open", props)]
    if t == "array":
        items = _freeze(schema.get("items", ANY_SCHEMA))
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        return [("arr_open", items, lo, None if hi is None else int(hi))]
    if t == "string":
        return [("str_open",)]
    if t == "integer":
        return [("num_start", True)]
    if t == "number":
        return [("num_start", False)]
    if t == "boolean":
        return [("enum", ("true", "false"), "")]
    if t == "null":
        return [("lit", "null")]
    # any value
    return [("any_value",)]


def _freeze(obj):
    """Make a schema hashable for frame tuples."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, list):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(frozen) -> Any:
    if isinstance(frozen, tuple):
        if all(
            isinstance(kv, tuple) and len(kv) == 2 and isinstance(kv[0], str)
            for kv in frozen
        ):
            return {k: _thaw(v) for k, v in frozen}
        return [_thaw(v) for v in frozen]
    return frozen


class _Parser:
    """Immutable character-level parser state: a stack of frames."""

    __slots__ = ("stack",)

    def __init__(self, stack: Tuple[Tuple, ...]):
        self.stack = stack

    @classmethod
    def for_schema(cls, schema: Dict[str, Any]) -> "_Parser":
        return cls(tuple(_value_frames(schema)))

    def signature(self) -> Tuple:
        return self.stack

    def can_end(self) -> bool:
        """True when the JSON document is complete."""
        stack = self.stack
        # A trailing number frame can be complete while still extendable.
        while stack:
            top = stack[-1]
            if top[0] == "num" and _num_can_end(top):
                stack = stack[:-1]
                continue
            return False
        return True

    # -- character transitions ------------------------------------------------

    def allowed_chars(self) -> str:
        if not self.stack:
            return ""
        chars = set(_frame_allowed(self.stack[-1]))
        # A complete number can also be terminated by whatever the frame
        # below allows next.
        top = self.stack[-1]
        if top[0] == "num" and _num_can_end(top) and len(self.stack) > 1:
            chars |= set(_Parser(self.stack[:-1]).allowed_chars())
        return "".join(chars)

    def advance(self, c: str) -> Optional["_Parser"]:
        if not self.stack:
            return None
        new_stack = _advance_stack(self.stack, c)
        return _Parser(new_stack) if new_stack is not None else None


def _num_can_end(frame: Tuple) -> bool:
    # ("num", text, integer_only)
    text = frame[1]
    if not text or text in ("-", "-0") and False:
        return False
    if text[-1] in "+-.eE":
        return False
    if text == "-":
        return False
    return True


def _frame_allowed(frame: Tuple) -> str:
    kind = frame[0]
    if kind == "lit":
        return frame[1][0] if frame[1] else ""
    if kind == "enum":
        options, acc = frame[1], frame[2]
        nxt = set()
        for opt in options:
            if opt.startswith(acc) and len(opt) > len(acc):
                nxt.add(opt[len(acc)])
        return "".join(nxt)
    if kind == "any_value":
        return '{["0123456789-tfn'
    if kind == "obj_open":
        return "{"
    if kind == "arr_open":
        return "["
    if kind == "str_open":
        return '"'
    if kind == "str_body":
        return _STRING_CHARS + '"' + "\\"
    if kind == "str_escape":
        return _ESCAPABLE
    if kind == "num_start":
        return "-" + _DIGITS
    if kind == "num":
        text, integer_only = frame[1], frame[2]
        allowed = ""
        last = text[-1]
        if last == "-":
            return _DIGITS
        if last in "+eE":
            return _DIGITS
        if last == ".":
            return _DIGITS
        if last in _DIGITS:
            allowed = _DIGITS
            if not integer_only and "." not in text and "e" not in text and "E" not in text:
                allowed += "."
            if not integer_only and "e" not in text and "E" not in text:
                allowed += "eE"
            # leading-zero rule: "0" or "-0" cannot be extended with digits
            digits_part = text.lstrip("-")
            if digits_part == "0":
                allowed = allowed.replace(_DIGITS, "")
                if not integer_only and "." not in text:
                    allowed += "."
                if not integer_only and "e" not in text and "E" not in text:
                    allowed += "eE"
            return allowed
        return allowed
    if kind == "obj_sep":
        return ","  # next property
    if kind == "arr_sep":
        return ",]" if frame[3] else ","
    raise AssertionError(f"unknown frame {kind}")


def _advance_stack(stack: Tuple[Tuple, ...], c: str) -> Optional[Tuple[Tuple, ...]]:
    top = stack[-1]
    rest = stack[:-1]
    kind = top[0]

    if kind == "lit":
        text = top[1]
        if not text.startswith(c):
            return None
        remaining = text[1:]
        return rest + (("lit", remaining),) if remaining else _pop(rest)

    if kind == "enum":
        options, acc = top[1], top[2]
        new_acc = acc + c
        viable = tuple(o for o in options if o.startswith(new_acc))
        if not viable:
            return None
        if any(o == new_acc for o in viable) and len(viable) == 1:
            return _pop(rest)
        if any(o == new_acc for o in viable):
            # exact match but longer options exist — JSON scalars are
            # prefix-free in practice; treat as complete.
            return _pop(rest)
        return rest + (("enum", options, new_acc),)

    if kind == "any_value":
        if c == "{":
            return rest + (("obj_body_any",),) if False else _any_obj(rest)
        if c == "[":
            return rest + (("arr_open", _freeze(ANY_SCHEMA), 0, None),) and _advance_stack(
                rest + (("arr_open", _freeze(ANY_SCHEMA), 0, None),), c
            )
        if c == '"':
            return rest + (("str_body", ""),)
        if c in "-0123456789":
            return rest + (("num", c, False),)
        if c == "t":
            return rest + (("lit", "rue"),)
        if c == "f":
            return rest + (("lit", "alse"),)
        if c == "n":
            return rest + (("lit", "ull"),)
        return None

    if kind == "obj_open":
        if c != "{":
            return None
        props = top[1]
        if not props:
            return rest + (("lit", "}"),)
        key, schema = props[0]
        frames: Tuple[Tuple, ...] = (("obj_props", props, 0),)
        import json as _json

        frames = frames + (("lit", _json.dumps(key) + ":"),)
        return rest + frames

    if kind == "obj_props":
        # only reached via pop-back; handled in _pop
        return None

    if kind == "arr_open":
        if c != "[":
            return None
        _, items, lo, hi = top
        if hi == 0 or (hi is None and lo == 0):
            if lo == 0:
                # allow immediate ] or first item
                return rest + (("arr_body", items, 0, lo, hi),)
        return rest + (("arr_body", items, 0, lo, hi),)

    if kind == "arr_body":
        _, items, count, lo, hi = top
        if c == "]" and count >= lo:
            return _pop(rest)
        # first item begins
        item_frames = tuple(_value_frames(_thaw(items)))
        ns = rest + (("arr_sep_state", items, count + 1, lo, hi),) + item_frames
        return _advance_stack(ns, c)

    if kind == "arr_sep_state":
        _, items, count, lo, hi = top
        if c == "]" and count >= lo:
            return _pop(rest)
        if c == "," and (hi is None or count < hi):
            item_frames = tuple(_value_frames(_thaw(items)))
            return rest + (("arr_sep_state", items, count + 1, lo, hi),) + item_frames
        return None

    if kind == "str_open":
        if c != '"':
            return None
        return rest + (("str_body", ""),)

    if kind == "str_body":
        if c == '"':
            return _pop(rest)
        if c == "\\":
            return rest + (("str_escape",), )
        if c in _STRING_CHARS or ord(c) > 0x7F:
            return stack  # stay in string body
        return None

    if kind == "str_escape":
        if c in _ESCAPABLE:
            return rest  # back to enclosing str_body? rest top should be str_body
        return None

    if kind == "num_start":
        integer_only = top[1]
        if c == "-" or c in _DIGITS:
            return rest + (("num", c, integer_only),)
        return None

    if kind == "num":
        text, integer_only = top[1], top[2]
        if c in _frame_allowed(top):
            return rest + (("num", text + c, integer_only),)
        # number may be complete; let the frame below consume c
        if _num_can_end(top) and rest:
            return _advance_stack(rest, c)
        return None

    if kind == "obj_sep":
        props, idx = top[1], top[2]
        if c == ",":
            import json as _json

            key, schema = props[idx]
            return rest + (
                ("obj_props", props, idx),
                ("lit", _json.dumps(key) + ":"),
            )
        return None

    raise AssertionError(f"unknown frame {kind}")


def _any_obj(rest: Tuple[Tuple, ...]) -> Tuple[Tuple, ...]:
    """'{' seen in any-value context: free-form object — key, colon, value,
    comma... Model as: lit '}' | string key. Simplified to an any-object frame
    machine using enum of closing or a key string."""
    return rest + (("any_obj_key_or_end",),)


def _pop(stack: Tuple[Tuple, ...]) -> Tuple[Tuple, ...]:
    """A value finished; resolve bookkeeping frames that expect a completion."""
    while stack:
        top = stack[-1]
        if top[0] == "obj_props":
            props, idx = top[1], top[2]
            if idx + 1 < len(props):
                return stack[:-1] + (("obj_sep", props, idx + 1),)
            return stack[:-1] + (("lit", "}"),)
        return stack
    return stack
