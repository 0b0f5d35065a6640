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
string `pattern` (ECMA-subset regex compiled to a char NFA riding in the
parser state; search semantics), numeric minimum/maximum/
exclusiveMinimum/exclusiveMaximum (exact digit-viability via Fractions;
exponents are disabled for range-bound numbers), allOf (static schema
conjunction, distributed over anyOf/oneOf), additionalProperties (free-form
objects whose values conform to the given schema, when no `properties` are
declared; `false` yields exactly "{}"), anyOf/oneOf (branch forking), $ref
to local "#/..." pointers (inlined at init, recursion capped). Inter-token
whitespace is accepted when `whitespace=True` (runs capped at 12 chars); the
default remains canonical single-spacing-free output. Unknown keywords (or a
missing type) mean "any JSON value".

Documented exotica NOT enforced: multipleOf; patternProperties /
propertyNames; additionalProperties emission alongside declared
`properties` (declared-only objects are generated there — the same
declared-only behavior lm-format-enforcer exhibits); minProperties/
maxProperties on free-form objects; oneOf exclusivity (treated as anyOf);
regex backreferences/lookaround/mid-pattern anchors (such patterns are
ignored rather than crashing); exponent notation inside range-bound
numbers; `not`; format/contentEncoding annotations.
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
_ESC_DECODE = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
               "n": "\n", "r": "\r", "t": "\t"}
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

    return _apply_allof(walk(root, {}))


def _merge_two(a, b):
    """Schema conjunction (allOf semantics) by STATIC merge. anyOf/oneOf on
    either side distribute (allOf[X, anyOf[A,B]] == anyOf[allOf[X,A],
    allOf[X,B]]); numeric/length/item bounds tighten; properties merge
    recursively; required unions; enums intersect; patterns conjoin (the
    str_body frame advances every pattern's NFA). An unsatisfiable pair
    (conflicting const/type) collapses to {"enum": []} — no character is
    accepted, matching an impossible schema."""
    if not isinstance(a, dict) or not a:
        return b
    if not isinstance(b, dict) or not b:
        return a
    for x, y in ((a, b), (b, a)):
        br = _schema_branches(x)
        if br is not None:
            rest = {k: v for k, v in x.items() if k not in ("anyOf", "oneOf")}
            return {"anyOf": [_merge_two(_merge_two(sub, rest), y)
                              for sub in br]}
    out = dict(a)
    for k, v in b.items():
        if k not in out:
            out[k] = v
            continue
        cur = out[k]
        if k == "type":
            if cur == v:
                continue
            if {cur, v} == {"integer", "number"}:
                out[k] = "integer"
            else:
                out["enum"] = []
        elif k == "properties":
            merged = dict(cur)
            for pk, pv in v.items():
                merged[pk] = _merge_two(merged[pk], pv) if pk in merged else pv
            out[k] = merged
        elif k in ("items", "additionalProperties"):
            if v is False or cur is False:
                out[k] = False
            elif cur is True or cur == {}:
                out[k] = v
            elif isinstance(cur, dict) and isinstance(v, dict):
                out[k] = _merge_two(cur, v)
        elif k == "required":
            out[k] = list(dict.fromkeys(list(cur) + list(v)))
        elif k in ("minLength", "minItems", "minimum", "minProperties",
                   "maxLength", "maxItems", "maximum", "maxProperties",
                   "exclusiveMinimum", "exclusiveMaximum"):
            if isinstance(cur, bool) and isinstance(v, bool):
                out[k] = cur or v
            elif isinstance(cur, bool):
                out[k] = v
            elif isinstance(v, bool):
                pass  # keep the numeric form
            elif k.startswith(("min", "exclusiveMin")):
                out[k] = max(cur, v)
            else:
                out[k] = min(cur, v)
        elif k == "enum":
            canon = {json.dumps(x, sort_keys=True) for x in v}
            out[k] = [x for x in cur
                      if json.dumps(x, sort_keys=True) in canon]
        elif k == "const":
            if cur != v:
                out["enum"] = []
        elif k == "pattern":
            cl = cur if isinstance(cur, list) else [cur]
            vl = v if isinstance(v, list) else [v]
            out[k] = cl + [p for p in vl if p not in cl]
        # any other duplicated keyword: keep a's value
    return out


def _apply_allof(node):
    """Bottom-up allOf elimination over a resolved schema tree."""
    if isinstance(node, list):
        return [_apply_allof(v) for v in node]
    if not isinstance(node, dict):
        return node
    node = {k: _apply_allof(v) for k, v in node.items()}
    sub = node.pop("allOf", None)
    if isinstance(sub, list):
        merged = node
        for s in sub:
            merged = _merge_two(merged, s)
        return merged
    return node


# ------------------------------------------------------------------ regex NFA
#
# JSON Schema string `pattern` support: an ECMA-regex subset compiled to a
# character NFA whose state SET rides inside the str_body frame and advances
# in lockstep with the trie walk (the "product with the trie walk" design,
# VERDICT r4 #3). Search semantics (unanchored patterns match anywhere) are
# realized by implicit `.*` wrappers unless ^/$ anchor the ends.
# Subset: literals, '.', [...] classes (ranges, negation), \d\w\s\D\W\S and
# escaped metachars, |, (…) and (?:…) groups, *, +, ?, {m}, {m,}, {m,n}.
# Not supported (documented): backreferences, lookaround, mid-pattern
# anchors, \b, unicode property classes.

_D = frozenset("0123456789")
_W = _D | frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_S = frozenset(" \t\n\r\f\v")


class _RegexError(ValueError):
    pass


class _Nfa:
    """Thompson NFA with epsilon closure precomputed. Transitions are
    (matcher, target); matcher = ("lit", ch) | ("any",) | ("in"/"out",
    frozenset chars, tuple of (lo, hi) ranges)."""

    __slots__ = ("trans", "eps", "accept", "start", "_closure")

    def __init__(self):
        self.trans: List[List[tuple]] = []
        self.eps: List[List[int]] = []
        self.accept: int = -1
        self.start: int = 0
        self._closure: List[frozenset] = []

    def new_state(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def finalize(self):
        n = len(self.trans)
        self._closure = []
        for s in range(n):
            seen = {s}
            stack = [s]
            while stack:
                cur = stack.pop()
                for t in self.eps[cur]:
                    if t not in seen:
                        seen.add(t)
                        stack.append(t)
            self._closure.append(frozenset(seen))

    def closure(self, states) -> frozenset:
        out = set()
        for s in states:
            out |= self._closure[s]
        return frozenset(out)

    @staticmethod
    def _match(m, c: str) -> bool:
        k = m[0]
        if k == "lit":
            return c == m[1]
        if k == "any":
            return c not in "\n\r"
        chars, ranges = m[1], m[2]
        hit = c in chars or any(lo <= c <= hi for lo, hi in ranges)
        return hit if k == "in" else (not hit)

    def step(self, states: frozenset, c: str) -> frozenset:
        out = set()
        for s in states:
            for m, t in self.trans[s]:
                if self._match(m, c):
                    out |= self._closure[t]
        return frozenset(out)

    def accepting(self, states: frozenset) -> bool:
        return self.accept in states

    def start_states(self) -> frozenset:
        return self._closure[self.start]

    def hint_chars(self, states: frozenset) -> Tuple[str, bool]:
        """(ASCII chars that can advance, open) — open=True when a negated
        class / '.' / a broad range makes enumeration incomplete; the caller
        then falls back to per-char stepping over the string charset."""
        chars = set()
        open_ = False
        for s in states:
            for m, _ in self.trans[s]:
                k = m[0]
                if k == "lit":
                    chars.add(m[1])
                elif k == "any" or k == "out":
                    open_ = True
                else:
                    chars |= set(m[1])
                    for lo, hi in m[2]:
                        if ord(hi) - ord(lo) > 96:
                            open_ = True
                        else:
                            chars |= {chr(x) for x in range(ord(lo), ord(hi) + 1)}
        return "".join(c for c in chars if " " <= c <= "\x7e"), open_


def _parse_class(pat: str, i: int):
    """Parse a [...] class starting after '['; returns (matcher, next_i)."""
    neg = False
    if i < len(pat) and pat[i] == "^":
        neg = True
        i += 1
    chars = set()
    ranges = []
    first = True
    while i < len(pat) and (pat[i] != "]" or first):
        first = False
        if pat[i] == "\\" and i + 1 < len(pat):
            e = pat[i + 1]
            i += 2
            if e == "d":
                chars |= _D
                continue
            if e == "w":
                chars |= _W
                continue
            if e == "s":
                chars |= _S
                continue
            ch = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v"}.get(e, e)
        else:
            ch = pat[i]
            i += 1
        if i + 1 < len(pat) and pat[i] == "-" and pat[i + 1] != "]":
            if pat[i + 1] == "\\" and i + 2 < len(pat):
                hi_ch = pat[i + 2]
                hi_ch = {"n": "\n", "t": "\t"}.get(hi_ch, hi_ch)
                i += 3
            else:
                hi_ch = pat[i + 1]
                i += 2
            ranges.append((ch, hi_ch))
        else:
            chars.add(ch)
    if i >= len(pat):
        raise _RegexError("unterminated class")
    return ("out" if neg else "in", frozenset(chars), tuple(ranges)), i + 1


def _compile_regex(pattern: str) -> _Nfa:
    """Compile to an NFA implementing full-string match of the SEARCH
    semantics of `pattern` (implicit .* around unanchored ends)."""
    anchored_start = pattern.startswith("^")
    body = pattern[1:] if anchored_start else pattern
    anchored_end = False
    if body.endswith("$"):
        bs = 0
        j = len(body) - 2
        while j >= 0 and body[j] == "\\":
            bs += 1
            j -= 1
        if bs % 2 == 0:
            anchored_end = True
            body = body[:-1]

    nfa = _Nfa()

    def frag_matcher(m):
        a, b = nfa.new_state(), nfa.new_state()
        nfa.trans[a].append((m, b))
        return a, b

    def frag_eps():
        a = nfa.new_state()
        return a, a

    pos = [0]

    def peek():
        return body[pos[0]] if pos[0] < len(body) else ""

    def parse_alt():
        frags = [parse_concat()]
        while peek() == "|":
            pos[0] += 1
            frags.append(parse_concat())
        if len(frags) == 1:
            return frags[0]
        a, b = nfa.new_state(), nfa.new_state()
        for fa, fb in frags:
            nfa.eps[a].append(fa)
            nfa.eps[fb].append(b)
        return a, b

    def parse_concat():
        frags = []
        while peek() not in ("", "|", ")"):
            frags.append(parse_repeat())
        if not frags:
            return frag_eps()
        for (_, fb), (na, _) in zip(frags, frags[1:]):
            nfa.eps[fb].append(na)
        return frags[0][0], frags[-1][1]

    def parse_repeat():
        start_pos = pos[0]
        frag = parse_atom()
        c = peek()

        def dup():
            # re-parse the atom for a fresh copy (bounded repetitions)
            saved = pos[0]
            pos[0] = start_pos
            f = parse_atom()
            pos[0] = saved
            return f

        if c == "*":
            pos[0] += 1
            a, b = nfa.new_state(), nfa.new_state()
            nfa.eps[a] += [frag[0], b]
            nfa.eps[frag[1]] += [frag[0], b]
            return a, b
        if c == "+":
            pos[0] += 1
            b = nfa.new_state()
            nfa.eps[frag[1]] += [frag[0], b]
            return frag[0], b
        if c == "?":
            pos[0] += 1
            a, b = nfa.new_state(), nfa.new_state()
            nfa.eps[a] += [frag[0], b]
            nfa.eps[frag[1]].append(b)
            return a, b
        if c == "{":
            j = body.find("}", pos[0])
            if j < 0:
                raise _RegexError("unterminated {}")
            spec = body[pos[0] + 1 : j]
            parts = spec.split(",")
            try:
                m = int(parts[0]) if parts[0] else 0
                if len(parts) == 1:
                    n = m
                else:
                    n = int(parts[1]) if parts[1] else None
            except ValueError:
                raise _RegexError(f"bad repetition {{{spec}}}")
            if n is not None and (n < m or n > 256) or m > 256:
                raise _RegexError(f"bad repetition {{{spec}}}")
            pos[0] = j + 1
            pieces = [frag] + [dup() for _ in range(max(m, 1 if n is None else n, 1) - 1)]
            a, b = nfa.new_state(), nfa.new_state()
            nfa.eps[a].append(pieces[0][0] if m > 0 else b)
            if m == 0:
                nfa.eps[a].append(pieces[0][0])
            prev_end = pieces[0][1]
            for idx, (pa, pb) in enumerate(pieces[1:], start=2):
                nfa.eps[prev_end].append(pa)
                if idx > m:
                    nfa.eps[prev_end].append(b)
                prev_end = pb
            nfa.eps[prev_end].append(b)
            if n is None:  # {m,}: loop the last piece
                nfa.eps[prev_end].append(pieces[-1][0])
            return a, b
        return frag

    def parse_atom():
        c = peek()
        if c == "(":
            pos[0] += 1
            if body[pos[0] : pos[0] + 2] == "?:":
                pos[0] += 2
            elif peek() == "?":
                raise _RegexError("lookaround not supported")
            f = parse_alt()
            if peek() != ")":
                raise _RegexError("unbalanced (")
            pos[0] += 1
            return f
        if c == "[":
            pos[0] += 1
            m, nxt = _parse_class(body, pos[0])
            pos[0] = nxt
            return frag_matcher(m)
        if c == ".":
            pos[0] += 1
            return frag_matcher(("any",))
        if c == "\\":
            if pos[0] + 1 >= len(body):
                raise _RegexError("trailing backslash")
            e = body[pos[0] + 1]
            pos[0] += 2
            if e == "d":
                return frag_matcher(("in", _D, ()))
            if e == "D":
                return frag_matcher(("out", _D, ()))
            if e == "w":
                return frag_matcher(("in", _W, ()))
            if e == "W":
                return frag_matcher(("out", _W, ()))
            if e == "s":
                return frag_matcher(("in", _S, ()))
            if e == "S":
                return frag_matcher(("out", _S, ()))
            if e in _DIGITS and e != "0":
                raise _RegexError("backreferences not supported")
            if e == "b" or e == "B":
                raise _RegexError("word-boundary anchors not supported")
            ch = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v"}.get(e, e)
            return frag_matcher(("lit", ch))
        if c in ("^", "$"):
            raise _RegexError("mid-pattern anchors not supported")
        if c in ("*", "+", "?", "{"):
            raise _RegexError(f"dangling quantifier {c!r}")
        pos[0] += 1
        return frag_matcher(("lit", c))

    core = parse_alt()
    if pos[0] != len(body):
        raise _RegexError(f"unparsed tail {body[pos[0]:]!r}")

    start = nfa.new_state()
    end = nfa.new_state()
    if not anchored_start:
        nfa.trans[start].append((("any",), start))  # .* prefix
    nfa.eps[start].append(core[0])
    nfa.eps[core[1]].append(end)
    if not anchored_end:
        nfa.trans[end].append((("any",), end))  # .* suffix
    nfa.start = start
    nfa.accept = end
    if len(nfa.trans) > 4096:
        raise _RegexError("pattern too large")
    nfa.finalize()
    return nfa


_PATTERN_CACHE: Dict[str, Optional[_Nfa]] = {}


def _pattern_nfa(pattern: str) -> Optional[_Nfa]:
    """Compiled NFA for `pattern`, or None when it uses unsupported syntax
    (the pattern is then IGNORED — under-constrained like the reference's
    enforcer on features it lacks, never a crash)."""
    nfa = _PATTERN_CACHE.get(pattern, False)
    if nfa is False:
        try:
            nfa = _compile_regex(pattern)
        except (_RegexError, RecursionError):
            nfa = None
        _PATTERN_CACHE[pattern] = nfa
    return nfa


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
#   ("str_body", n, lo, hi, pats)  inside '"..."'; n chars so far; '"' pops
#                                  (iff n >= lo and every pattern NFA
#                                  accepts); chars allowed iff n < hi and
#                                  every pattern NFA advances. pats = tuple
#                                  of (pattern_str, frozenset nfa_states)
#   ("str_escape", n, lo, hi)      after '\'; escapable char -> str_body n+1
#                                  (pattern NFAs advance by the DECODED char)
#   ("num", text, int_only, rng)   number in progress (may end implicitly);
#                                  rng = None or (lo, lo_excl, hi, hi_excl)
#                                  enforced by digit viability (Fractions)
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
#   ("anyobj_first", vs)           after '{' of a free-form object; vs =
#                                  frozen value schema (additionalProperties)
#   ("anyobj_key", vs)             expect ':' after a free key
#   ("anyobj_after", vs)           after a free value: ',' / '}'
#   ("ws", n)                      inside a whitespace run of length n

Stack = Tuple[Tuple, ...]
State = Tuple[Stack, ...]  # NFA: set of live stacks

# Frames where inter-token whitespace may appear (whitespace=True): every
# between-JSON-token position.
_WS_FRAMES = frozenset((
    "val", "litws", "objnext", "obj_after", "arr_first", "arr_after",
    "anyobj_first", "anyobj_key", "anyobj_after",
))


def _str_frame(n: int, lo: int, hi, pats: Tuple = ()) -> Tuple:
    """str_body frame with the char counter NORMALIZED: once past minLength
    with no maxLength, every further count behaves identically, so clamping
    keeps the parser state RECURRENT — the per-state mask memo hits instead
    of paying a full vocabulary-trie walk per generated character inside an
    unbounded string. (With patterns the NFA state sets also recur — e.g.
    `[a-z]+` cycles in one state — so memoization still applies.)"""
    if hi is None and n > lo:
        n = lo
    return ("str_body", n, lo, hi, pats)


def _pats_step(pats: Tuple, c: str) -> Optional[Tuple]:
    """Advance every pattern NFA by one character; None = some pattern died."""
    out = []
    for pat, states in pats:
        nfa = _pattern_nfa(pat)
        if nfa is None:
            continue
        ns = nfa.step(states, c)
        if not ns:
            return None
        out.append((pat, ns))
    return tuple(out)


def _pats_accept(pats: Tuple) -> bool:
    for pat, states in pats:
        nfa = _pattern_nfa(pat)
        if nfa is not None and not nfa.accepting(states):
            return False
    return True


def _pats_start(schema_pattern) -> Tuple:
    """pats tuple from a schema's `pattern` (str, or internal list form
    produced by the allOf merge). Unsupported patterns are skipped."""
    if schema_pattern is None:
        return ()
    pat_list = (
        list(schema_pattern)
        if isinstance(schema_pattern, (list, tuple))
        else [schema_pattern]
    )
    out = []
    for p in pat_list:
        if isinstance(p, tuple):  # frozen ("#", value) list form
            p = p[1] if len(p) == 2 and p[0] == "#" else p
        if not isinstance(p, str):
            continue
        nfa = _pattern_nfa(p)
        if nfa is not None:
            out.append((p, nfa.start_states()))
    return tuple(out)


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
            ap = s.get("additionalProperties")
            if ap is False or "properties" in s:
                # declared-empty (or all-declared with none) -> only "{}"
                return [below + (("lit", "}"),)]
            # free-form object; values conform to the additionalProperties
            # schema (true/absent = any value)
            vs = _freeze(ap) if isinstance(ap, dict) else ANY
            return [below + (("anyobj_first", vs),)]
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
        pats = _pats_start(s.get("pattern"))
        return [below + (("str_body", 0, lo, None if hi is None else int(hi),
                          pats),)]
    if t in ("integer", "number"):
        int_only = t == "integer"
        rng = _num_bounds(s)
        if (c == "-" or c in _DIGITS) and _num_viable(c, int_only, rng):
            return [below + (("num", c, int_only, rng),)]
        return []
    if t == "boolean":
        return _step(below + (("enum", ("false", "true"), ""),), c)
    if t == "null":
        return _step(below + (("lit", "null"),), c)
    # any value
    if c == "{":
        return [below + (("anyobj_first", ANY),)]
    if c == "[":
        return [below + (("arr_first", ANY, 0, None),)]
    if c == '"':
        return [below + (("str_body", 0, 0, None, ()),)]
    if c == "-" or c in _DIGITS:
        return [below + (("num", c, False, None),)]
    if c == "t":
        return [below + (("lit", "rue"),)]
    if c == "f":
        return [below + (("lit", "alse"),)]
    if c == "n":
        return [below + (("lit", "ull"),)]
    return []


def _num_complete(text: str) -> bool:
    return bool(text) and text[-1] in _DIGITS


def _num_bounds(s: dict):
    """rng tuple (lo, lo_excl, hi, hi_excl) from a schema's numeric-range
    keywords (draft-06 numeric exclusiveMinimum/Maximum and the draft-04
    boolean form), or None when unbounded. multipleOf is NOT enforced
    (documented; character-level enforcement is ill-defined for floats)."""
    lo = s.get("minimum")
    hi = s.get("maximum")
    lox = hix = False
    exlo = s.get("exclusiveMinimum")
    exhi = s.get("exclusiveMaximum")
    if isinstance(exlo, bool):
        lox = exlo and lo is not None
    elif isinstance(exlo, (int, float)):
        if lo is None or exlo >= lo:
            lo, lox = exlo, True
    if isinstance(exhi, bool):
        hix = exhi and hi is not None
    elif isinstance(exhi, (int, float)):
        if hi is None or exhi <= hi:
            hi, hix = exhi, True
    if lo is None and hi is None:
        return None
    from fractions import Fraction

    return (
        None if lo is None else Fraction(lo),
        lox,
        None if hi is None else Fraction(hi),
        hix,
    )


def _num_in_range(text: str, rng) -> bool:
    """Is the (syntactically complete) number's value inside rng?"""
    if rng is None:
        return True
    from fractions import Fraction

    v = Fraction(text)
    lo, lox, hi, hix = rng
    if lo is not None and (v < lo or (lox and v == lo)):
        return False
    if hi is not None and (v > hi or (hix and v == hi)):
        return False
    return True


def _num_reach(text: str, int_only: bool):
    """Reachable completion values of numeric prefix `text` (no exponent —
    e/E is disabled whenever a range constrains the number) as a list of
    intervals (lo, lo_open, hi, hi_open); None ends mean unbounded."""
    from fractions import Fraction

    if text == "-":
        return [(None, False, Fraction(0), False)]  # any negative, or -0
    neg = text.startswith("-")
    out = []
    if "." in text:
        ipart, fpart = text.split(".")
        flen = len(fpart)
        cur = Fraction(text if fpart else ipart)
        step = Fraction(1, 10 ** flen) if flen else Fraction(1)
        if neg:
            out.append((cur - step, True, cur, False))
        else:
            out.append((cur, False, cur + step, True))
        return out
    v = Fraction(int(text))
    out.append((v, False, v, False))  # stop here
    digits = text.lstrip("-")
    leading_zero = digits == "0"
    if not int_only:
        # fraction extension of the current digits
        if neg:
            out.append((v - 1, True, v, False))
        else:
            out.append((v, False, v + 1, True))
    if not leading_zero:
        p = 1
        for _ in range(64):
            p *= 10
            if neg:
                out.append(((v - 1) * p, True, v * p, False))
            else:
                out.append((v * p, False, (v + 1) * p, True))
            # further powers only move farther from zero; the caller's
            # intersection test stops mattering — cap the enumeration
            if abs(v * p) > 10 ** 40:
                break
        if int_only:
            pass  # integer extensions are dense enough inside the intervals
    return out


def _num_viable(text: str, int_only: bool, rng) -> bool:
    """Can `text` be extended (or stopped) into a value inside rng?"""
    if rng is None:
        return True
    lo, lox, hi, hix = rng
    for a, a_open, b, b_open in _num_reach(text, int_only):
        # intersect [a, b] (with open flags) against [lo, hi]
        ca, ca_open = a, a_open
        cb, cb_open = b, b_open
        if lo is not None and (ca is None or lo > ca or (lo == ca and lox and not ca_open)):
            ca, ca_open = lo, lox
        if hi is not None and (cb is None or hi < cb or (hi == cb and hix and not cb_open)):
            cb, cb_open = hi, hix
        if ca is None or cb is None:
            return True
        if ca < cb or (ca == cb and not ca_open and not cb_open):
            if not int_only:
                return True
            # need an integer inside (ca, cb) respecting open ends
            import math

            lo_i = math.ceil(ca)
            if ca_open and lo_i == ca:
                lo_i += 1
            hi_i = math.floor(cb)
            if cb_open and hi_i == cb:
                hi_i -= 1
            if lo_i <= hi_i:
                return True
    return False


def _num_next_chars(text: str, int_only: bool, rng=None) -> str:
    last = text[-1]
    if last in "eE":
        return "+-" + _DIGITS
    if last in "+-.":
        base = _DIGITS
    elif "e" in text or "E" in text:
        return _DIGITS  # exponent digits (rng is None whenever e is allowed)
    else:  # last is a digit
        int_part = text.split(".")[0]
        leading_zero = int_part.lstrip("-") == "0" and "." not in text
        base = "" if leading_zero else _DIGITS
        if "." in text:
            base = _DIGITS
        if not int_only:
            if "." not in text:
                base += "."
            if rng is None:
                base += "eE"  # exponents disabled under range constraints
    if rng is not None:
        base = "".join(c for c in base if _num_viable(text + c, int_only, rng))
    return base


def _key_lit(key: str) -> str:
    return json.dumps(key)


def _num_can_end(frame: Tuple) -> bool:
    return _num_complete(frame[1]) and _num_in_range(frame[1], frame[3])


def _frame_allowed(frame: Tuple) -> str:
    kind = frame[0]
    if kind in ("lit", "litws"):
        return frame[1][0]
    if kind == "val":
        return _val_first_chars(frame[1])
    if kind == "str_body":
        _, n, lo, hi, pats = frame
        out = '"' if n >= lo and _pats_accept(pats) else ""
        if hi is None or n < hi:
            if not pats:
                out += _STRING_ASCII + "\\"
            else:
                # chars every pattern NFA can advance on; escapes allowed
                # when some escapable decoded char advances them all
                cand = set(_STRING_ASCII)
                open_ = True
                for pat, states in pats:
                    nfa = _pattern_nfa(pat)
                    if nfa is None:
                        continue
                    hint, op = nfa.hint_chars(states)
                    if not op:
                        cand &= set(hint)
                        open_ = False
                for c in sorted(cand):
                    if _pats_step(pats, c) is not None:
                        out += c
                for e, dc in _ESC_DECODE.items():
                    if _pats_step(pats, dc) is not None:
                        out += "\\"
                        break
                _ = open_  # non-ASCII handled by the trie walk's step filter
        return out
    if kind == "str_escape":
        return _ESCAPABLE
    if kind == "num":
        return _num_next_chars(frame[1], frame[2], frame[3])
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
        _, n, lo, hi, pats = top
        if c == '"':
            return [below] if n >= lo and _pats_accept(pats) else []
        if hi is not None and n >= hi:
            return []
        if c == "\\":
            return [below + (("str_body", n, lo, hi, pats),
                             ("str_escape", 0, 0, 0))]
        if c in _STRING_CHARS:
            np_ = _pats_step(pats, c)
            if np_ is None:
                return []
            return [below + (_str_frame(n + 1, lo, hi, np_),)]
        return []

    if kind == "str_escape":
        if c not in _ESCAPABLE:
            return []
        # below top is str_body: the escape counts as ONE char, and the
        # pattern NFAs advance by the DECODED character.
        body = below[-1]
        assert body[0] == "str_body", body
        _, n, lo, hi, pats = body
        if hi is not None and n >= hi:
            return []
        np_ = _pats_step(pats, _ESC_DECODE[c])
        if np_ is None:
            return []
        return [below[:-1] + (_str_frame(n + 1, lo, hi, np_),)]

    if kind == "num":
        text, int_only, rng = top[1], top[2], top[3]
        if c in _num_next_chars(text, int_only, rng):
            return [below + (("num", text + c, int_only, rng),)]
        if _num_can_end(top):
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
        vs = top[1]
        if c == "}":
            return [below]
        if c == '"':
            return [below + (("anyobj_key", vs), ("str_body", 0, 0, None, ()))]
        return []

    if kind == "anyobj_key":
        vs = top[1]
        if c == ":":
            return [below + (("anyobj_after", vs), ("val", vs))]
        return []

    if kind == "anyobj_after":
        vs = top[1]
        if c == "}":
            return [below]
        if c == ",":
            # next free key: opening quote, then the key string
            return [below + (("anyobj_key", vs),
                             ("str_body", 0, 0, None, ()), ("lit", '"'))]
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
        # a COMPLETE (and in-range) number may be followed by whitespace
        return _num_can_end(top) and _ws_ok(stack[:-1])
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
    if top[0] == "num" and _num_can_end(top):
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
        if top[0] == "ws" or (top[0] == "num" and _num_can_end(top)):
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
