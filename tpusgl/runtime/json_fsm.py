"""Native JSON-schema constrained-decoding automaton.

The reference delegates to lm-format-enforcer's TokenEnforcer
(/root/reference/constraints.py:19-42); that package is unavailable here, so
the same capability is implemented from scratch:

1. a character-level pushdown parser for schema-constrained JSON — an
   immutable stack of frames, each exposing its allowed next characters,
2. a prefix trie over the tokenizer vocabulary,
3. allowed-token sets computed by walking the trie against the parser (a
   token is allowed iff all its characters are accepted), memoized per
   distinct parser state so recurring states (e.g. "inside a free string")
   pay the walk once.

Deliberate subset vs full JSON Schema (canonical-output enforcement):
- no whitespace between JSON tokens,
- object properties are emitted in schema `properties` order, all present,
- supported keywords: type (object/array/string/integer/number/boolean/null),
  properties, items, enum, const, minItems/maxItems; anything else (or a
  missing type) means "any JSON value".
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from tpusgl.runtime.constraints import ConstraintState

_DIGITS = "0123456789"
_STRING_CHARS = "".join(
    chr(c) for c in range(0x20, 0x10000) if chr(c) not in ('"', "\\")
)
# For allowed-char sets we only enumerate ASCII; non-ASCII is accepted via the
# `_STR_ANY` wildcard marker handled by the trie walk.
_STRING_ASCII = "".join(chr(c) for c in range(0x20, 0x7F) if chr(c) not in ('"', "\\"))
_ESCAPABLE = '"\\/bfnrt'

ANY = ()  # frozen "any value" schema


def _freeze(obj):
    if isinstance(obj, dict):
        # preserves insertion order — object properties are emitted in
        # schema `properties` order
        return tuple((k, _freeze(v)) for k, v in obj.items())
    if isinstance(obj, list):
        return tuple(("#", _freeze(v)) for v in obj)
    return obj


def _thaw(fz):
    if isinstance(fz, tuple):
        if all(isinstance(kv, tuple) and len(kv) == 2 for kv in fz):
            if any(kv[0] == "#" for kv in fz):
                return [_thaw(v) for _, v in fz]
            return {k: _thaw(v) for k, v in fz}
        return []
    return fz


# A parser state is a tuple of frames, top of stack LAST. Frame kinds:
#   ("lit", s)                     emit literal string s, then pop
#   ("val", frozen_schema)         a value; expands lazily on first char
#   ("str_body",)                  inside '"..."'; '"' pops
#   ("str_escape",)                after '\'; escapable char pops to str_body
#   ("num", text, int_only)        number in progress (may end implicitly)
#   ("enum", options, acc)         one of several literal strings
#   ("obj_after", props, idx)      after a property value: ',' next prop / '}'
#   ("arr_first", items, lo, hi)   after '[': ']' or first item
#   ("arr_after", items, n, lo, hi) after an item: ',' next / ']'
#   ("anyobj_first",)              after '{' of a free object
#   ("anyobj_key",)                expect ':' after a free key
#   ("anyobj_after",)              after a free value: ',' / '}'

Stack = Tuple[Tuple, ...]


def _val_first_chars(schema) -> str:
    """First characters a value conforming to `schema` may start with."""
    s = _thaw(schema) if isinstance(schema, tuple) else schema
    if not isinstance(s, dict) or not s:
        return '{["-0123456789tfn'
    if "const" in s:
        return json.dumps(s["const"])[0]
    if "enum" in s:
        return "".join({json.dumps(v)[0] for v in s["enum"]})
    t = s.get("type")
    if t == "object" or (t is None and "properties" in s):
        return "{"
    if t == "array":
        return "["
    if t == "string":
        return '"'
    if t in ("integer", "number"):
        return "-" + _DIGITS
    if t == "boolean":
        return "tf"
    if t == "null":
        return "n"
    return '{["-0123456789tfn'


def _expand_val(schema, c: str, below: Stack) -> Optional[Stack]:
    """Expand a ("val", schema) frame on first char `c`; returns new stack."""
    s = _thaw(schema) if isinstance(schema, tuple) else schema
    if not isinstance(s, dict):
        s = {}
    if "const" in s:
        return _step(below + (("lit", json.dumps(s["const"])),), c)
    if "enum" in s:
        opts = tuple(sorted(json.dumps(v) for v in s["enum"]))
        return _step(below + (("enum", opts, ""),), c)
    t = s.get("type")
    if t == "object" or (t is None and "properties" in s):
        if c != "{":
            return None
        props = tuple((k, _freeze(v)) for k, v in (s.get("properties") or {}).items())
        if not props:
            return below + (("lit", "}"),)
        key, sch = props[0]
        return below + (
            ("obj_after", props, 0),
            ("val", sch),
            ("lit", json.dumps(key) + ":"),
        )
    if t == "array":
        if c != "[":
            return None
        items = _freeze(s.get("items", {}))
        lo = int(s.get("minItems", 0))
        hi = s.get("maxItems")
        return below + (("arr_first", items, lo, None if hi is None else int(hi)),)
    if t == "string":
        if c != '"':
            return None
        return below + (("str_body",),)
    if t in ("integer", "number"):
        int_only = t == "integer"
        if c == "-" or c in _DIGITS:
            return below + (("num", c, int_only),)
        return None
    if t == "boolean":
        return _step(below + (("enum", ("false", "true"), ""),), c)
    if t == "null":
        return _step(below + (("lit", "null"),), c)
    # any value
    if c == "{":
        return below + (("anyobj_first",),)
    if c == "[":
        return below + (("arr_first", ANY, 0, None),)
    if c == '"':
        return below + (("str_body",),)
    if c == "-" or c in _DIGITS:
        return below + (("num", c, False),)
    if c == "t":
        return below + (("lit", "rue"),)
    if c == "f":
        return below + (("lit", "alse"),)
    if c == "n":
        return below + (("lit", "ull"),)
    return None


def _num_complete(text: str) -> bool:
    return bool(text) and text[-1] in _DIGITS


def _num_next_chars(text: str, int_only: bool) -> str:
    last = text[-1]
    if last in "eE":
        return "+-" + _DIGITS
    if last in "+-.":
        return _DIGITS
    # last is a digit
    if "e" in text or "E" in text:
        return _DIGITS  # exponent digits
    int_part = text.split(".")[0]
    leading_zero = int_part.lstrip("-") == "0" and "." not in text
    out = "" if leading_zero else _DIGITS
    if "." in text:
        out = _DIGITS
    if not int_only:
        if "." not in text:
            out += "."
        out += "eE"
    return out


def _frame_allowed(frame: Tuple) -> str:
    kind = frame[0]
    if kind == "lit":
        return frame[1][0]
    if kind == "val":
        return _val_first_chars(frame[1])
    if kind == "str_body":
        return _STRING_ASCII + '"\\'
    if kind == "str_escape":
        return _ESCAPABLE
    if kind == "num":
        return _num_next_chars(frame[1], frame[2])
    if kind == "enum":
        opts, acc = frame[1], frame[2]
        return "".join({o[len(acc)] for o in opts if o.startswith(acc) and len(o) > len(acc)})
    if kind == "obj_after":
        props, idx = frame[1], frame[2]
        return "," if idx + 1 < len(props) else "}"
    if kind == "arr_first":
        _, items, lo, hi = frame
        out = _val_first_chars(items) if hi != 0 else ""
        if lo == 0:
            out += "]"
        return out
    if kind == "arr_after":
        _, items, n, lo, hi = frame
        out = ""
        if hi is None or n < hi:
            out += ","
        if n >= lo:
            out += "]"
        return out
    if kind == "anyobj_first":
        return '"}'
    if kind == "anyobj_key":
        return ":"
    if kind == "anyobj_after":
        return ",}"
    raise AssertionError(f"unknown frame {kind}")


def _step(stack: Stack, c: str) -> Optional[Stack]:
    if not stack:
        return None
    top = stack[-1]
    below = stack[:-1]
    kind = top[0]

    if kind == "lit":
        text = top[1]
        if not text.startswith(c):
            return None
        return below if len(text) == 1 else below + (("lit", text[1:]),)

    if kind == "val":
        return _expand_val(top[1], c, below)

    if kind == "str_body":
        if c == '"':
            return below
        if c == "\\":
            return stack + (("str_escape",),)
        if c in _STRING_CHARS:
            return stack
        return None

    if kind == "str_escape":
        return below if c in _ESCAPABLE else None  # below top is str_body

    if kind == "num":
        text, int_only = top[1], top[2]
        if c in _num_next_chars(text, int_only):
            return below + (("num", text + c, int_only),)
        if _num_complete(text):
            return _step(below, c)  # number ends; frame below consumes c
        return None

    if kind == "enum":
        opts, acc = top[1], top[2]
        new_acc = acc + c
        viable = [o for o in opts if o.startswith(new_acc)]
        if not viable:
            return None
        if new_acc in viable:
            return below  # JSON scalar literals are prefix-free
        return below + (("enum", opts, new_acc),)

    if kind == "obj_after":
        props, idx = top[1], top[2]
        if c == "," and idx + 1 < len(props):
            key, sch = props[idx + 1]
            return below + (
                ("obj_after", props, idx + 1),
                ("val", sch),
                ("lit", json.dumps(key) + ":"),
            )
        if c == "}" and idx + 1 >= len(props):
            return below
        return None

    if kind == "arr_first":
        _, items, lo, hi = top
        if c == "]" and lo == 0:
            return below
        if hi == 0:
            return None
        ns = below + (("arr_after", items, 1, lo, hi), ("val", items))
        return _step(ns, c)

    if kind == "arr_after":
        _, items, n, lo, hi = top
        if c == "]" and n >= lo:
            return below
        if c == "," and (hi is None or n < hi):
            return below + (("arr_after", items, n + 1, lo, hi), ("val", items))
        return None

    if kind == "anyobj_first":
        if c == "}":
            return below
        if c == '"':
            return below + (("anyobj_key",), ("str_body",))
        return None

    if kind == "anyobj_key":
        if c == ":":
            return below + (("anyobj_after",), ("val", ANY))
        return None

    if kind == "anyobj_after":
        if c == "}":
            return below
        if c == ",":
            # next free key: opening quote, then the key string
            return below + (("anyobj_key",), ("str_body",), ("lit", '"'))
        return None

    raise AssertionError(f"unknown frame {kind}")


def _allowed_chars(stack: Stack) -> str:
    if not stack:
        return ""
    top = stack[-1]
    chars = _frame_allowed(top)
    if top[0] == "num" and _num_complete(top[1]):
        chars += _allowed_chars(stack[:-1])
    return chars


def _can_end(stack: Stack) -> bool:
    while stack:
        top = stack[-1]
        if top[0] == "num" and _num_complete(top[1]):
            stack = stack[:-1]
            continue
        return False
    return True


# ------------------------------------------------------------------ tokenizer


class TokenTrie:
    """Prefix trie over decoded token strings (built once per tokenizer)."""

    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[str, TokenTrie] = {}
        self.token_ids: List[int] = []

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "TokenTrie":
        root = cls()
        vocab_size = getattr(tokenizer, "vocab_size", None) or len(tokenizer)
        special = set(getattr(tokenizer, "all_special_ids", []) or [])
        for tid in range(vocab_size):
            if tid in special:
                continue
            try:
                s = tokenizer.decode([tid])
            except Exception:
                continue
            if not s or "�" in s:
                continue
            node = root
            for ch in s:
                nxt = node.children.get(ch)
                if nxt is None:
                    nxt = node.children[ch] = cls()
                node = nxt
            node.token_ids.append(tid)
        return root


class JsonConstraintState(ConstraintState):
    """Token-level mask provider for one request (reference
    constraints.py:19-42 by way of lm-format-enforcer, re-implemented)."""

    _trie_cache: Dict[int, TokenTrie] = {}

    def __init__(self, schema: Dict[str, Any], tokenizer):
        self.tokenizer = tokenizer
        self.eos_id = getattr(tokenizer, "eos_token_id", None)
        key = id(tokenizer)
        trie = self._trie_cache.get(key)
        if trie is None:
            trie = self._trie_cache[key] = TokenTrie.from_tokenizer(tokenizer)
        self.trie = trie
        self.root_stack: Stack = (("val", _freeze(schema or {})),)
        # prefix cache: committed output ids -> parser stack
        self._prefix_ids: Tuple[int, ...] = ()
        self._prefix_stack: Optional[Stack] = self.root_stack
        self._mask_cache: Dict[Stack, np.ndarray] = {}

    def reset(self) -> None:
        self._prefix_ids = ()
        self._prefix_stack = self.root_stack

    def _advance_text(self, stack: Optional[Stack], text: str) -> Optional[Stack]:
        for ch in text:
            if stack is None:
                return None
            stack = _step(stack, ch)
        return stack

    def _stack_for(self, output_ids: Sequence[int]) -> Optional[Stack]:
        ids = tuple(int(t) for t in output_ids)
        if ids[: len(self._prefix_ids)] == self._prefix_ids:
            new_ids = ids[len(self._prefix_ids) :]
        else:
            self.reset()
            new_ids = ids
        stack = self._prefix_stack
        if new_ids:
            text = self.tokenizer.decode(list(new_ids))
            prev = self.tokenizer.decode(list(self._prefix_ids)) if self._prefix_ids else ""
            full = self.tokenizer.decode(list(ids))
            # decode suffix robustly (BPE merges may change boundaries)
            suffix = full[len(prev) :] if full.startswith(prev) else text
            stack = self._advance_text(stack, suffix)
        self._prefix_ids = ids
        self._prefix_stack = stack
        return stack

    def _walk(self, node: TokenTrie, stack: Stack, out: List[int]) -> None:
        out.extend(node.token_ids)
        if not node.children:
            return
        allowed = set(_allowed_chars(stack))
        str_mode = stack and stack[-1][0] == "str_body"
        for ch, child in node.children.items():
            ok = ch in allowed or (str_mode and ch in _STRING_CHARS)
            if not ok:
                continue
            nxt = _step(stack, ch)
            if nxt is not None:
                self._walk(child, nxt, out)

    def allowed_tokens(self, output_ids: Sequence[int]) -> np.ndarray:
        stack = self._stack_for(output_ids)
        if stack is None:
            return np.empty((0,), np.int64)
        cached = self._mask_cache.get(stack)
        if cached is not None:
            return cached
        out: List[int] = []
        # Root token_ids are empty-string tokens — never allowed mid-document.
        allowed = set(_allowed_chars(stack))
        str_mode = stack and stack[-1][0] == "str_body"
        for ch, child in self.trie.children.items():
            if ch in allowed or (str_mode and ch in _STRING_CHARS):
                nxt = _step(stack, ch)
                if nxt is not None:
                    self._walk(child, nxt, out)
        if _can_end(stack) and self.eos_id is not None:
            out.append(int(self.eos_id))
        arr = np.asarray(sorted(set(out)), np.int64)
        self._mask_cache[stack] = arr
        return arr
