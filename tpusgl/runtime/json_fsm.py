"""Native JSON-schema constrained-decoding automaton.

The reference delegates to lm-format-enforcer's TokenEnforcer
(/root/reference/constraints.py:19-42); that package is unavailable here, so
the same capability is implemented from scratch:

1. a character-level pushdown parser for schema-constrained JSON — the parser
   state is a SET of frame stacks (an NFA of pushdown automata: `anyOf` /
   `oneOf` fork the stack, dead branches drop out),
2. a prefix trie over the tokenizer vocabulary,
3. allowed-token sets computed by walking the trie against the parser (a
   token is allowed iff all its characters are accepted by at least one
   branch), memoized per distinct parser state so recurring states (e.g.
   "inside a free string") pay the walk once.

Supported JSON-Schema keywords (toward lm-format-enforcer parity,
/root/reference/constraints.py:22-23): type (object/array/string/integer/
number/boolean/null), properties, required (non-required properties are
OPTIONAL and may be skipped; emission order still follows `properties`
order), items, enum, const, minItems/maxItems, minLength/maxLength (strings),
anyOf/oneOf (branch forking), $ref to local "#/..." pointers (inlined at
init, recursion capped). Inter-token whitespace is accepted when
`whitespace=True` (runs capped at 12 chars); the default remains canonical
single-spacing-free output. Unknown keywords (or a missing type) mean "any
JSON value". Not supported: allOf, string `pattern`, numeric ranges,
additionalProperties emission (only declared properties are generated).
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
# `_STRING_CHARS` membership test in the trie walk.
_STRING_ASCII = "".join(chr(c) for c in range(0x20, 0x7F) if chr(c) not in ('"', "\\"))
_ESCAPABLE = '"\\/bfnrt'
_WS = " \t\n\r"
_MAX_WS_RUN = 12

ANY = ()  # frozen "any value" schema


def resolve_refs(schema: Any, max_depth: int = 6) -> Any:
    """Inline local "#/..." $ref pointers (lm-format-enforcer resolves these
    via JsonSchemaParser). Recursive schemas are truncated to "any value"
    past `max_depth` inlinings of the same pointer."""
    if not isinstance(schema, dict):
        return schema
    root = schema

    def deref(pointer: str):
        node: Any = root
        for part in pointer.lstrip("#/").split("/"):
            if not part:
                continue
            part = part.replace("~1", "/").replace("~0", "~")
            if isinstance(node, list):
                node = node[int(part)]
            else:
                node = node[part]
        return node

    def walk(node: Any, depths: Dict[str, int]) -> Any:
        if isinstance(node, list):
            return [walk(v, depths) for v in node]
        if not isinstance(node, dict):
            return node
        ref = node.get("$ref")
        if isinstance(ref, str) and ref.startswith("#"):
            d = depths.get(ref, 0)
            if d >= max_depth:
                return {}
            try:
                target = deref(ref)
            except (KeyError, IndexError, ValueError):
                return {}
            return walk(target, {**depths, ref: d + 1})
        return {k: walk(v, depths) for k, v in node.items()
                if k not in ("$defs", "definitions")}

    return walk(root, {})


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


# A parser state is a TUPLE OF STACKS; each stack is a tuple of frames, top
# LAST. Frame kinds:
#   ("lit", s)                     emit literal string s, then pop
#   ("litws", s)                   same, but whitespace may precede each char
#   ("val", frozen_schema)         a value; expands lazily on first char
#   ("str_body", n, lo, hi)        inside '"..."'; n chars so far; '"' pops
#                                  (iff n >= lo); chars allowed iff n < hi
#   ("str_escape", n, lo, hi)      after '\'; escapable char -> str_body n+1
#   ("num", text, int_only)        number in progress (may end implicitly)
#   ("enum", options, acc)         one of several literal strings
#   ("objnext", props, req, idx, after_comma)
#                                  choosing the next property (index >= idx;
#                                  optional ones skippable); '}' closes iff
#                                  no required prop remains and not just
#                                  after a comma
#   ("objkey", props, req, cands, acc)
#                                  matching a '"key"' among candidate prop
#                                  indices; on completion emits ':' + value
#   ("obj_after", props, req, nxt) after a property value: ',' / '}'
#   ("arr_first", items, lo, hi)   after '[': ']' or first item
#   ("arr_after", items, n, lo, hi) after an item: ',' next / ']'
#   ("anyobj_first",)              after '{' of a free object
#   ("anyobj_key",)                expect ':' after a free key
#   ("anyobj_after",)              after a free value: ',' / '}'
#   ("ws", n)                      inside a whitespace run of length n

Stack = Tuple[Tuple, ...]
State = Tuple[Stack, ...]  # NFA: set of live stacks

# Frames where inter-token whitespace may appear (whitespace=True): every
# between-JSON-token position.
_WS_FRAMES = frozenset((
    "val", "litws", "objnext", "obj_after", "arr_first", "arr_after",
    "anyobj_first", "anyobj_key", "anyobj_after",
))


def _str_frame(n: int, lo: int, hi) -> Tuple:
    """str_body frame with the char counter NORMALIZED: once past minLength
    with no maxLength, every further count behaves identically, so clamping
    keeps the parser state RECURRENT — the per-state mask memo hits instead
    of paying a full vocabulary-trie walk per generated character inside an
    unbounded string."""
    if hi is None and n > lo:
        n = lo
    return ("str_body", n, lo, hi)


def _schema_branches(s: dict) -> Optional[List[Any]]:
    """anyOf/oneOf branch list, or None."""
    br = s.get("anyOf") or s.get("oneOf")
    if isinstance(br, list) and br:
        return br
    return None


def _val_first_chars(schema) -> str:
    """First characters a value conforming to `schema` may start with."""
    s = _thaw(schema) if isinstance(schema, tuple) else schema
    if not isinstance(s, dict) or not s:
        return '{["-0123456789tfn'
    br = _schema_branches(s)
    if br is not None:
        return "".join({c for sub in br for c in _val_first_chars(sub)})
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


def _req_tuple(s: dict, props) -> Tuple[bool, ...]:
    req = s.get("required")
    if not isinstance(req, list):
        req = []
    names = set(req)
    return tuple(k in names for k, _ in props)


def _obj_can_close(props, req, idx: int) -> bool:
    """True when every property at index >= idx is optional."""
    return not any(req[i] for i in range(idx, len(props)))


def _obj_candidates(props, req, idx: int) -> Tuple[int, ...]:
    """Property indices that may legally be emitted next: each idx' >= idx
    whose predecessors in [idx, idx') are all optional."""
    out = []
    for i in range(idx, len(props)):
        out.append(i)
        if req[i]:
            break
    return tuple(out)


def _expand_val(schema, c: str, below: Stack) -> List[Stack]:
    """Expand a ("val", schema) frame on first char `c`; returns live stacks."""
    s = _thaw(schema) if isinstance(schema, tuple) else schema
    if not isinstance(s, dict):
        s = {}
    br = _schema_branches(s)
    if br is not None:
        out: List[Stack] = []
        for sub in br:
            out.extend(_expand_val(_freeze(sub), c, below))
        return out
    if "const" in s:
        return _step(below + (("lit", json.dumps(s["const"])),), c)
    if "enum" in s:
        opts = tuple(sorted(json.dumps(v) for v in s["enum"]))
        return _step(below + (("enum", opts, ""),), c)
    t = s.get("type")
    if t == "object" or (t is None and "properties" in s):
        if c != "{":
            return []
        props = tuple((k, _freeze(v)) for k, v in (s.get("properties") or {}).items())
        if not props:
            return [below + (("lit", "}"),)]
        req = _req_tuple(s, props)
        return [below + (("objnext", props, req, 0, False),)]
    if t == "array":
        if c != "[":
            return []
        items = _freeze(s.get("items", {}))
        lo = int(s.get("minItems", 0))
        hi = s.get("maxItems")
        return [below + (("arr_first", items, lo, None if hi is None else int(hi)),)]
    if t == "string":
        if c != '"':
            return []
        lo = int(s.get("minLength", 0))
        hi = s.get("maxLength")
        return [below + (("str_body", 0, lo, None if hi is None else int(hi)),)]
    if t in ("integer", "number"):
        int_only = t == "integer"
        if c == "-" or c in _DIGITS:
            return [below + (("num", c, int_only),)]
        return []
    if t == "boolean":
        return _step(below + (("enum", ("false", "true"), ""),), c)
    if t == "null":
        return _step(below + (("lit", "null"),), c)
    # any value
    if c == "{":
        return [below + (("anyobj_first",),)]
    if c == "[":
        return [below + (("arr_first", ANY, 0, None),)]
    if c == '"':
        return [below + (("str_body", 0, 0, None),)]
    if c == "-" or c in _DIGITS:
        return [below + (("num", c, False),)]
    if c == "t":
        return [below + (("lit", "rue"),)]
    if c == "f":
        return [below + (("lit", "alse"),)]
    if c == "n":
        return [below + (("lit", "ull"),)]
    return []


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


def _key_lit(key: str) -> str:
    return json.dumps(key)


def _frame_allowed(frame: Tuple) -> str:
    kind = frame[0]
    if kind in ("lit", "litws"):
        return frame[1][0]
    if kind == "val":
        return _val_first_chars(frame[1])
    if kind == "str_body":
        _, n, lo, hi = frame
        out = '"' if n >= lo else ""
        if hi is None or n < hi:
            out += _STRING_ASCII + "\\"
        return out
    if kind == "str_escape":
        return _ESCAPABLE
    if kind == "num":
        return _num_next_chars(frame[1], frame[2])
    if kind == "enum":
        opts, acc = frame[1], frame[2]
        return "".join({o[len(acc)] for o in opts if o.startswith(acc) and len(o) > len(acc)})
    if kind == "objnext":
        _, props, req, idx, after_comma = frame
        out = '"' if idx < len(props) else ""
        if not after_comma and _obj_can_close(props, req, idx):
            out += "}"
        return out
    if kind == "objkey":
        _, props, req, cands, acc = frame
        chars = set()
        for ci in cands:
            t = _key_lit(props[ci][0])
            if t.startswith(acc) and len(t) > len(acc):
                chars.add(t[len(acc)])
        return "".join(chars)
    if kind == "obj_after":
        _, props, req, nxt = frame
        out = "," if nxt < len(props) else ""
        if _obj_can_close(props, req, nxt):
            out += "}"
        return out
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
    if kind == "ws":
        return ""  # handled by the ws machinery; never queried directly
    raise AssertionError(f"unknown frame {kind}")


def _step(stack: Stack, c: str) -> List[Stack]:
    """Advance one stack by one char; returns the list of successor stacks
    (empty = dead branch; >1 only through anyOf/oneOf expansion)."""
    if not stack:
        return []
    top = stack[-1]
    below = stack[:-1]
    kind = top[0]

    if kind in ("lit", "litws"):
        text = top[1]
        if not text.startswith(c):
            return []
        return [below] if len(text) == 1 else [below + ((kind, text[1:]),)]

    if kind == "val":
        return _expand_val(top[1], c, below)

    if kind == "str_body":
        _, n, lo, hi = top
        if c == '"':
            return [below] if n >= lo else []
        if hi is not None and n >= hi:
            return []
        if c == "\\":
            return [below + (("str_body", n, lo, hi), ("str_escape", 0, 0, 0))]
        if c in _STRING_CHARS:
            return [below + (_str_frame(n + 1, lo, hi),)]
        return []

    if kind == "str_escape":
        if c not in _ESCAPABLE:
            return []
        # below top is str_body (n, lo, hi): the escape counts as one char
        body = below[-1]
        assert body[0] == "str_body", body
        _, n, lo, hi = body
        if hi is not None and n >= hi:
            return []
        return [below[:-1] + (_str_frame(n + 1, lo, hi),)]

    if kind == "num":
        text, int_only = top[1], top[2]
        if c in _num_next_chars(text, int_only):
            return [below + (("num", text + c, int_only),)]
        if _num_complete(text):
            return _step(below, c)  # number ends; frame below consumes c
        return []

    if kind == "enum":
        opts, acc = top[1], top[2]
        new_acc = acc + c
        viable = [o for o in opts if o.startswith(new_acc)]
        if not viable:
            return []
        if new_acc in viable:
            return [below]  # JSON scalar literals are prefix-free
        return [below + (("enum", opts, new_acc),)]

    if kind == "objnext":
        _, props, req, idx, after_comma = top
        if c == '"' and idx < len(props):
            cands = _obj_candidates(props, req, idx)
            return [below + (("objkey", props, req, cands, '"'),)]
        if c == "}" and not after_comma and _obj_can_close(props, req, idx):
            return [below]
        return []

    if kind == "objkey":
        _, props, req, cands, acc = top
        new_acc = acc + c
        out: List[Stack] = []
        viable = []
        for ci in cands:
            t = _key_lit(props[ci][0])
            if t == new_acc:
                # full key matched (encoded keys are prefix-free): emit
                # ':' (ws-tolerant) then the value.
                out.append(below + (
                    ("obj_after", props, req, ci + 1),
                    ("val", props[ci][1]),
                    ("litws", ":"),
                ))
            elif t.startswith(new_acc):
                viable.append(ci)
        if viable:
            out.append(below + (("objkey", props, req, tuple(viable), new_acc),))
        return out

    if kind == "obj_after":
        _, props, req, nxt = top
        if c == "," and nxt < len(props):
            return [below + (("objnext", props, req, nxt, True),)]
        if c == "}" and _obj_can_close(props, req, nxt):
            return [below]
        return []

    if kind == "arr_first":
        _, items, lo, hi = top
        if c == "]" and lo == 0:
            return [below]
        if hi == 0:
            return []
        ns = below + (("arr_after", items, 1, lo, hi), ("val", items))
        return _step(ns, c)

    if kind == "arr_after":
        _, items, n, lo, hi = top
        if c == "]" and n >= lo:
            return [below]
        if c == "," and (hi is None or n < hi):
            return [below + (("arr_after", items, n + 1, lo, hi), ("val", items))]
        return []

    if kind == "anyobj_first":
        if c == "}":
            return [below]
        if c == '"':
            return [below + (("anyobj_key",), ("str_body", 0, 0, None))]
        return []

    if kind == "anyobj_key":
        if c == ":":
            return [below + (("anyobj_after",), ("val", ANY))]
        return []

    if kind == "anyobj_after":
        if c == "}":
            return [below]
        if c == ",":
            # next free key: opening quote, then the key string
            return [below + (("anyobj_key",), ("str_body", 0, 0, None), ("lit", '"'))]
        return []

    raise AssertionError(f"unknown frame {kind}")


def _ws_ok(stack: Stack) -> bool:
    """May a whitespace char appear here (between JSON tokens)?"""
    if not stack:
        return False
    top = stack[-1]
    if top[0] == "ws":
        return top[1] < _MAX_WS_RUN
    if top[0] == "num":
        # a COMPLETE number may be followed by inter-token whitespace
        return _num_complete(top[1]) and _ws_ok(stack[:-1])
    return top[0] in _WS_FRAMES


def _step_ws(stack: Stack, c: str) -> List[Stack]:
    """Step with whitespace tolerance: ws chars self-loop (capped run) at
    between-token positions; other chars pop any ws frame first.

    A ws char can ALSO be literal content — a space inside a string body,
    an enum/const literal, or a quoted property key — so both readings are
    taken as NFA branches (the literal _step naturally dies where ws isn't
    legal content)."""
    if stack and stack[-1][0] == "ws":
        if c in _WS:
            n = stack[-1][1]
            return (
                [stack[:-1] + (("ws", n + 1),)] if n < _MAX_WS_RUN else []
            )
        return _step(stack[:-1], c)
    if c in _WS:
        out = list(_step(stack, c))  # literal reading (string content etc.)
        if _ws_ok(stack):
            if stack and stack[-1][0] == "num":
                # terminate the number, then open a ws run
                out.append(stack[:-1] + (("ws", 1),))
            else:
                out.append(stack + (("ws", 1),))
        return out
    return _step(stack, c)


def _step_state(state: State, c: str, ws: bool) -> State:
    out: List[Stack] = []
    seen = set()
    for stack in state:
        for ns in (_step_ws(stack, c) if ws else _step(stack, c)):
            if ns not in seen:
                seen.add(ns)
                out.append(ns)
    return tuple(out)


def _allowed_chars(stack: Stack) -> str:
    if not stack:
        return ""
    top = stack[-1]
    if top[0] == "ws":
        return _allowed_chars(stack[:-1])
    chars = _frame_allowed(top)
    if top[0] == "num" and _num_complete(top[1]):
        chars += _allowed_chars(stack[:-1])
    return chars


def _allowed_state(state: State, ws: bool) -> str:
    chars = set()
    for stack in state:
        chars.update(_allowed_chars(stack))
        if ws and _ws_ok(stack):
            chars.update(_WS)
    return "".join(chars)


def _stack_can_end(stack: Stack) -> bool:
    while stack:
        top = stack[-1]
        if top[0] == "ws" or (top[0] == "num" and _num_complete(top[1])):
            stack = stack[:-1]
            continue
        return False
    return True


def _can_end(state: State) -> bool:
    return any(_stack_can_end(s) for s in state)


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

    def __init__(self, schema: Dict[str, Any], tokenizer, whitespace: bool = False):
        self.tokenizer = tokenizer
        self.eos_id = getattr(tokenizer, "eos_token_id", None)
        self.whitespace = whitespace
        # The trie lives ON the tokenizer object so its lifetime is tied to
        # it. (An id(tokenizer)-keyed module dict was a stale-cache bug: ids
        # are reused after garbage collection, silently handing a NEW
        # tokenizer some dead tokenizer's trie.)
        trie = getattr(tokenizer, "_tpusgl_token_trie", None)
        if trie is None:
            trie = TokenTrie.from_tokenizer(tokenizer)
            try:
                tokenizer._tpusgl_token_trie = trie
            except (AttributeError, TypeError):  # pragma: no cover
                pass
        self.trie = trie
        resolved = resolve_refs(schema or {})
        self.root_state: State = ((("val", _freeze(resolved)),),)
        # prefix cache: committed output ids -> parser state
        self._prefix_ids: Tuple[int, ...] = ()
        self._prefix_state: State = self.root_state
        self._mask_cache: Dict[State, np.ndarray] = {}

    def reset(self) -> None:
        self._prefix_ids = ()
        self._prefix_state = self.root_state

    def _advance_text(self, state: State, text: str) -> State:
        for ch in text:
            if not state:
                return ()
            state = _step_state(state, ch, self.whitespace)
        return state

    def _state_for(self, output_ids: Sequence[int]) -> State:
        ids = tuple(int(t) for t in output_ids)
        if ids[: len(self._prefix_ids)] == self._prefix_ids:
            new_ids = ids[len(self._prefix_ids) :]
        else:
            self.reset()
            new_ids = ids
        state = self._prefix_state
        if new_ids:
            text = self.tokenizer.decode(list(new_ids))
            prev = self.tokenizer.decode(list(self._prefix_ids)) if self._prefix_ids else ""
            full = self.tokenizer.decode(list(ids))
            # decode suffix robustly (BPE merges may change boundaries)
            suffix = full[len(prev) :] if full.startswith(prev) else text
            state = self._advance_text(state, suffix)
        self._prefix_ids = ids
        self._prefix_state = state
        return state

    def _walk(self, node: TokenTrie, state: State, out: List[int]) -> None:
        out.extend(node.token_ids)
        if not node.children:
            return
        allowed = set(_allowed_state(state, self.whitespace))
        str_mode = any(s and s[-1][0] == "str_body" for s in state)
        for ch, child in node.children.items():
            ok = ch in allowed or (str_mode and ch in _STRING_CHARS)
            if not ok:
                continue
            nxt = _step_state(state, ch, self.whitespace)
            if nxt:
                self._walk(child, nxt, out)

    def allowed_tokens(self, output_ids: Sequence[int]) -> np.ndarray:
        state = self._state_for(output_ids)
        if not state:
            return np.empty((0,), np.int64)
        cached = self._mask_cache.get(state)
        if cached is not None:
            return cached
        out: List[int] = []
        # Root token_ids are empty-string tokens — never allowed mid-document.
        allowed = set(_allowed_state(state, self.whitespace))
        str_mode = any(s and s[-1][0] == "str_body" for s in state)
        for ch, child in self.trie.children.items():
            if ch in allowed or (str_mode and ch in _STRING_CHARS):
                nxt = _step_state(state, ch, self.whitespace)
                if nxt:
                    self._walk(child, nxt, out)
        if _can_end(state) and self.eos_id is not None:
            out.append(int(self.eos_id))
        arr = np.asarray(sorted(set(out)), np.int64)
        self._mask_cache[state] = arr
        return arr
