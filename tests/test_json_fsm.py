"""JSON-schema constrained decoding: character FSM acceptance, token-trie
masks, and end-to-end schema-conforming generation (which the reference can
only do via lm-format-enforcer and not at all under overlap,
/root/reference/scheduler.py:632-637)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.runtime.json_fsm import (
    JsonConstraintState,
    _can_end,
    _freeze,
    _step_state,
    resolve_refs,
)


def accepts(schema, text, ws=False):
    state = (((("val", _freeze(resolve_refs(schema or {}))),),))
    for c in text:
        state = _step_state(state, c, ws)
        if not state:
            return False
    return _can_end(state)


SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 2},
        "active": {"type": "boolean"},
    },
    "required": ["name", "age", "tags", "active"],
}


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"name":"bob","age":3,"tags":["a"],"active":true}', True),
        ('{"name":"b\\"ob","age":-12,"tags":[],"active":false}', True),
        ('{"name":"bob","age":3.5,"tags":[],"active":true}', False),  # integer
        ('{"age":3,"name":"bob","tags":[],"active":true}', False),  # order fixed
        ('{"name":"bob","age":3,"tags":["a","b","c"],"active":true}', False),  # maxItems
        ('{"name":"bob","age":3,"tags":[],"active":true', False),  # unterminated
        ('{"name":"bob","age":03,"tags":[],"active":true}', False),  # leading zero
    ],
)
def test_schema_fsm_acceptance(text, ok):
    assert accepts(SCHEMA, text) == ok


@pytest.mark.parametrize(
    "text,ok",
    [
        ("{}", True),
        ('{"k":[1,2.5,null,{"x":"y"}],"z":true}', True),
        ('"hello"', True),
        ("-0.25e-3", True),
        ("[]", True),
        ("[1,]", False),
        ("{", False),
        ("tru", False),
        ("01", False),
    ],
)
def test_any_json_fsm_acceptance(text, ok):
    assert accepts(None, text) == ok


class CharTokenizer:
    """Toy tokenizer: id == ord(char) for ASCII, plus merged tokens to
    exercise multi-char trie walks. id 0 is eos."""

    eos_token_id = 0
    all_special_ids = [0]
    vocab_size = 132

    MERGED = {128: '":', 129: "true", 130: '{"', 131: '",'}

    def decode(self, ids):
        out = []
        for i in ids:
            i = int(i)
            if i == 0:
                continue
            out.append(self.MERGED.get(i, chr(i) if 0 < i < 128 else ""))
        return "".join(out)

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [ord(c) for c in text]}


def greedy_constrained_rollout(schema, max_steps=200):
    """Always pick the smallest allowed token; must terminate in valid JSON."""
    tok = CharTokenizer()
    cs = JsonConstraintState(schema, tok)
    out = []
    for _ in range(max_steps):
        allowed = cs.allowed_tokens(out)
        assert len(allowed) > 0, f"dead end after {tok.decode(out)!r}"
        if tok.eos_token_id in allowed and len(out) > 0:
            return tok.decode(out)
        # prefer closing/structural chars so the rollout terminates
        allowed_set = set(allowed.tolist())
        for pref in ('"', '}', ']', ','):
            if ord(pref) in allowed_set:
                choice = ord(pref)
                break
        else:
            choice = min(allowed_set)
        out.append(choice)
    raise AssertionError("did not terminate: " + tok.decode(out))


def test_token_masks_produce_valid_json():
    text = greedy_constrained_rollout(SCHEMA)
    doc = json.loads(text)
    assert set(doc) == {"name", "age", "tags", "active"}
    assert isinstance(doc["age"], int)
    assert isinstance(doc["tags"], list) and len(doc["tags"]) <= 2
    assert isinstance(doc["active"], bool)


def test_multichar_tokens_allowed():
    tok = CharTokenizer()
    cs = JsonConstraintState(SCHEMA, tok)
    allowed = set(cs.allowed_tokens([]).tolist())
    assert ord("{") in allowed
    assert 130 in allowed  # '{"' crosses two frames


OPT_SCHEMA = {
    "type": "object",
    "properties": {
        "a": {"type": "integer"},
        "b": {"type": "string"},
        "c": {"type": "boolean"},
    },
    "required": ["b"],
}


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"a":1,"b":"x","c":true}', True),
        ('{"b":"x"}', True),                 # optionals skipped
        ('{"a":1,"b":"x"}', True),           # trailing optional skipped
        ('{"b":"x","c":false}', True),
        ('{"a":1,"c":true}', False),         # required b missing
        ('{}', False),                        # required b missing
        ('{"b":"x",}', False),               # trailing comma
        ('{"c":true,"b":"x"}', False),       # order still schema order
        ('{"a":1,"a":2,"b":"x"}', False),    # no duplicate property
    ],
)
def test_optional_properties(text, ok):
    assert accepts(OPT_SCHEMA, text) == ok


def test_all_optional_empty_object():
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"}}}
    assert accepts(schema, "{}")
    assert accepts(schema, '{"a":7}')


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"v":3}', True),
        ('{"v":"s"}', True),
        ('{"v":true}', False),
        ('{"v":[1]}', False),
    ],
)
def test_anyof_fork(text, ok):
    schema = {
        "type": "object",
        "properties": {
            "v": {"anyOf": [{"type": "integer"}, {"type": "string"}]},
        },
        "required": ["v"],
    }
    assert accepts(schema, text) == ok


def test_oneof_objects():
    schema = {
        "oneOf": [
            {"type": "object", "properties": {"x": {"type": "integer"}},
             "required": ["x"]},
            {"type": "object", "properties": {"y": {"type": "string"}},
             "required": ["y"]},
        ]
    }
    assert accepts(schema, '{"x":1}')
    assert accepts(schema, '{"y":"s"}')
    assert not accepts(schema, '{"x":"s"}')
    assert not accepts(schema, '{"z":1}')


@pytest.mark.parametrize(
    "text,ok",
    [
        ('"abc"', True),
        ('"ab"', False),    # minLength 3
        ('"abcde"', True),
        ('"abcdef"', False),  # maxLength 5
        ('"ab\\nc"', True),   # escape counts as one char
    ],
)
def test_string_length_bounds(text, ok):
    schema = {"type": "string", "minLength": 3, "maxLength": 5}
    assert accepts(schema, text) == ok


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{ "a" : 1 }', True),
        ('{\n  "a": 1\n}', True),
        ('{"a":1}', True),
        ('{ "a" : 1 ,', False),   # unterminated
        ('[ 1 , 2 ]', False),     # not an object
        ('{"a" 1}', False),       # missing colon
    ],
)
def test_whitespace_flag(text, ok):
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    assert accepts(schema, text, ws=True) == ok
    # canonical mode still rejects whitespace
    assert not accepts(schema, '{ "a" : 1 }', ws=False)


def test_ws_mode_keeps_literal_whitespace():
    """Whitespace tolerance must not break ws chars that are CONTENT:
    string bodies, enum/const literals, quoted property keys."""
    assert accepts({"type": "string"}, '"hello world"', ws=True)
    assert accepts({"enum": ["a b"]}, '"a b"', ws=True)
    assert accepts({"const": [1, 2]}, "[1, 2]", ws=True)
    schema = {"type": "object",
              "properties": {"a key": {"type": "integer"}},
              "required": ["a key"]}
    assert accepts(schema, '{ "a key" : 1 }', ws=True)
    assert accepts(schema, '{"a key":1}', ws=True)


def test_free_string_states_recur():
    """Unbounded-string states must be RECURRENT so the per-state token-mask
    memo hits (an exact char counter made every character a fresh state —
    a full vocab-trie walk per generated token)."""
    from tpusgl.runtime.json_fsm import _step_state

    state = (((("val", _freeze({"type": "string"})),),))
    state = _step_state(state, '"', False)
    seen = set()
    for ch in "abcdefgh":
        state = _step_state(state, ch, False)
        seen.add(state)
    assert len(seen) == 1, "string states must not grow with length"


def test_ws_run_capped():
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    assert not accepts(schema, "{" + " " * 40 + '"a":1}', ws=True)


def test_ref_resolution():
    schema = {
        "type": "object",
        "properties": {
            "p": {"$ref": "#/$defs/point"},
        },
        "required": ["p"],
        "$defs": {
            "point": {
                "type": "object",
                "properties": {"x": {"type": "integer"},
                               "y": {"type": "integer"}},
                "required": ["x", "y"],
            }
        },
    }
    assert accepts(schema, '{"p":{"x":1,"y":2}}')
    assert not accepts(schema, '{"p":{"x":1}}')


def test_recursive_ref_capped():
    schema = {
        "type": "object",
        "properties": {"next": {"$ref": "#"}, "v": {"type": "integer"}},
        "required": ["v"],
    }
    # a few levels of nesting parse; the cap just truncates to ANY deeper
    assert accepts(schema, '{"next":{"v":2},"v":1}')


def test_property_based_valid_under_jsonschema():
    """Random rollouts through the token mask must validate under the real
    `jsonschema` library (VERDICT r3 #6 acceptance test)."""
    import random

    import jsonschema

    schemas = [
        OPT_SCHEMA,
        {"type": "object",
         "properties": {
             "id": {"type": "integer"},
             "name": {"type": "string", "minLength": 1, "maxLength": 8},
             "kind": {"enum": ["a", "b"]},
             "vals": {"type": "array", "items": {"type": "number"},
                      "minItems": 1, "maxItems": 3},
         },
         "required": ["id", "kind"]},
        {"anyOf": [{"type": "integer"},
                   {"type": "object",
                    "properties": {"s": {"type": "string"}},
                    "required": ["s"]}]},
    ]
    tok = CharTokenizer()
    rng = random.Random(0)
    for schema in schemas:
        for trial in range(5):
            cs = JsonConstraintState(schema, tok)
            out = []
            for _ in range(120):
                allowed = cs.allowed_tokens(out).tolist()
                assert allowed, f"dead end: {tok.decode(out)!r}"
                if tok.eos_token_id in allowed and (
                    rng.random() < 0.5 or len(allowed) == 1
                ):
                    break
                non_eos = [t for t in allowed if t != tok.eos_token_id]
                # bias toward structural closers so rollouts terminate
                closers = [t for t in non_eos
                           if tok.decode([t]) in ('"', "}", "]", ",")]
                if closers and rng.random() < 0.6:
                    out.append(rng.choice(closers))
                else:
                    out.append(rng.choice(non_eos))
            else:
                continue  # didn't terminate; skip validation for this trial
            doc = json.loads(tok.decode(out))
            jsonschema.validate(doc, schema)


@pytest.mark.parametrize(
    "schema,text,ok",
    [
        # numeric ranges: integers
        ({"type": "integer", "minimum": 5, "maximum": 120}, "5", True),
        ({"type": "integer", "minimum": 5, "maximum": 120}, "4", False),
        ({"type": "integer", "minimum": 5, "maximum": 120}, "120", True),
        ({"type": "integer", "minimum": 5, "maximum": 120}, "121", False),
        ({"type": "integer", "minimum": -20, "maximum": -3}, "-20", True),
        ({"type": "integer", "minimum": -20, "maximum": -3}, "-21", False),
        ({"type": "integer", "minimum": -20, "maximum": -3}, "-2", False),
        ({"type": "integer", "exclusiveMinimum": 5}, "5", False),
        ({"type": "integer", "exclusiveMinimum": 5}, "6", True),
        # draft-04 boolean exclusive form
        ({"type": "integer", "minimum": 5, "exclusiveMinimum": True}, "5", False),
        ({"type": "integer", "minimum": 5, "exclusiveMinimum": True}, "6", True),
        # numeric ranges: floats (exponents disabled under bounds)
        ({"type": "number", "exclusiveMinimum": 0, "maximum": 1.5}, "0", False),
        ({"type": "number", "exclusiveMinimum": 0, "maximum": 1.5}, "0.001", True),
        ({"type": "number", "exclusiveMinimum": 0, "maximum": 1.5}, "1.5", True),
        ({"type": "number", "exclusiveMinimum": 0, "maximum": 1.5}, "1.51", False),
        ({"type": "number", "minimum": 0.25, "maximum": 0.75}, "0.5", True),
        ({"type": "number", "minimum": 0.25, "maximum": 0.75}, "0.2", False),
        ({"type": "number", "maximum": -1}, "-1.0", True),
        ({"type": "number", "maximum": -1}, "-0.5", False),
        # pattern: anchored, unanchored (search), classes, repetition
        ({"type": "string", "pattern": "^[a-z]+@[a-z]+\\.(com|org)$"},
         '"ab@cd.com"', True),
        ({"type": "string", "pattern": "^[a-z]+@[a-z]+\\.(com|org)$"},
         '"ab@cd.net"', False),
        ({"type": "string", "pattern": "abc"}, '"xx abc yy"', True),
        ({"type": "string", "pattern": "abc"}, '"ab"', False),
        ({"type": "string", "pattern": "^\\d{2,4}$"}, '"123"', True),
        ({"type": "string", "pattern": "^\\d{2,4}$"}, '"1"', False),
        ({"type": "string", "pattern": "^\\d{2,4}$"}, '"12345"', False),
        ({"type": "string", "pattern": "^[A-Z][a-z]*$"}, '"Bob"', True),
        ({"type": "string", "pattern": "^[A-Z][a-z]*$"}, '"bob"', False),
        # escape decodes before the NFA sees it
        ({"type": "string", "pattern": "^a\\nb$"}, '"a\\nb"', True),
        ({"type": "string", "pattern": "^a\\nb$"}, '"anb"', False),
        # pattern AND length bounds together
        ({"type": "string", "pattern": "^[ab]+$", "maxLength": 2}, '"ab"', True),
        ({"type": "string", "pattern": "^[ab]+$", "maxLength": 2}, '"aba"', False),
        # allOf: merged objects, tightened bounds, distribution over anyOf
        ({"allOf": [
            {"type": "object", "properties": {"a": {"type": "integer"}},
             "required": ["a"]},
            {"type": "object", "properties": {"a": {"minimum": 3},
                                              "b": {"type": "string"}},
             "required": ["b"]}]},
         '{"a":5,"b":"x"}', True),
        ({"allOf": [
            {"type": "object", "properties": {"a": {"type": "integer"}},
             "required": ["a"]},
            {"type": "object", "properties": {"a": {"minimum": 3},
                                              "b": {"type": "string"}},
             "required": ["b"]}]},
         '{"a":2,"b":"x"}', False),
        ({"allOf": [{"type": "string", "minLength": 2},
                    {"type": "string", "maxLength": 3}]}, '"ab"', True),
        ({"allOf": [{"type": "string", "minLength": 2},
                    {"type": "string", "maxLength": 3}]}, '"abcd"', False),
        ({"allOf": [{"anyOf": [{"type": "integer"}, {"type": "string"}]},
                    {"minimum": 10, "minLength": 2}]}, "12", True),
        ({"allOf": [{"anyOf": [{"type": "integer"}, {"type": "string"}]},
                    {"minimum": 10, "minLength": 2}]}, "5", False),
        ({"allOf": [{"anyOf": [{"type": "integer"}, {"type": "string"}]},
                    {"minimum": 10, "minLength": 2}]}, '"ab"', True),
        # two patterns conjoined by allOf
        ({"allOf": [{"type": "string", "pattern": "^[a-c]+$"},
                    {"type": "string", "pattern": "b"}]}, '"ab"', True),
        ({"allOf": [{"type": "string", "pattern": "^[a-c]+$"},
                    {"type": "string", "pattern": "b"}]}, '"ac"', False),
        # additionalProperties
        ({"type": "object", "additionalProperties": {"type": "integer"}},
         "{}", True),
        ({"type": "object", "additionalProperties": {"type": "integer"}},
         '{"x":3,"y":4}', True),
        ({"type": "object", "additionalProperties": {"type": "integer"}},
         '{"x":"s"}', False),
        ({"type": "object", "additionalProperties": False}, "{}", True),
        ({"type": "object", "additionalProperties": False}, '{"x":3}', False),
        # bare object = free-form
        ({"type": "object"}, '{"any":"thing"}', True),
    ],
)
def test_extended_keywords_acceptance(schema, text, ok):
    assert accepts(schema, text) == ok


def test_property_based_extended_keywords():
    """Rollouts through the token mask for pattern/allOf/range/
    additionalProperties schemas must validate under `jsonschema`
    (VERDICT r4 #3 acceptance criterion)."""
    import random

    import jsonschema

    schemas = [
        {"type": "object",
         "properties": {
             "code": {"type": "string", "pattern": "^[A-Z]{2}-\\d{3}$"},
             "score": {"type": "number", "minimum": 0, "maximum": 1},
             "count": {"type": "integer", "minimum": 1, "maximum": 99},
         },
         "required": ["code", "score", "count"]},
        {"allOf": [
            {"type": "object", "properties": {"a": {"type": "integer",
                                                    "minimum": -5}},
             "required": ["a"]},
            {"type": "object", "properties": {"a": {"maximum": 20},
                                              "t": {"enum": ["x", "y"]}},
             "required": ["t"]}]},
        {"type": "object",
         "additionalProperties": {"type": "integer", "minimum": 0,
                                  "maximum": 200}},
        {"type": "string", "pattern": "^(foo|bar)+$", "maxLength": 9},
    ]
    tok = CharTokenizer()
    rng = random.Random(1)
    validated = 0
    for schema in schemas:
        for trial in range(6):
            cs = JsonConstraintState(schema, tok)
            out = []
            for _ in range(160):
                allowed = cs.allowed_tokens(out).tolist()
                assert allowed, f"dead end: {tok.decode(out)!r}"
                if tok.eos_token_id in allowed and (
                    rng.random() < 0.5 or len(allowed) == 1
                ):
                    break
                non_eos = [t for t in allowed if t != tok.eos_token_id]
                closers = [t for t in non_eos
                           if tok.decode([t]) in ('"', "}", "]", ",")]
                if closers and rng.random() < 0.6:
                    out.append(rng.choice(closers))
                else:
                    out.append(rng.choice(non_eos))
            else:
                continue
            doc = json.loads(tok.decode(out))
            jsonschema.validate(doc, schema)
            validated += 1
    assert validated >= len(schemas)  # at least one rollout per schema


def test_pattern_unsupported_syntax_ignored():
    """Backreferences/lookaround are documented-unsupported: the pattern is
    ignored (under-constrained), never a crash."""
    schema = {"type": "string", "pattern": "^(a)\\1$"}  # backreference
    assert accepts(schema, '"anything"')  # pattern dropped
    schema = {"type": "string", "pattern": "(?=x)"}  # lookahead
    assert accepts(schema, '"y"')


def test_range_masks_have_no_dead_ends():
    """Digit-viability must never let generation paint itself into a corner:
    every mask along a range-constrained number offers a way to finish."""
    tok = CharTokenizer()
    schema = {"type": "integer", "minimum": 123, "maximum": 4567}
    cs = JsonConstraintState(schema, tok)
    import random

    rng = random.Random(2)
    for _ in range(20):
        out = []
        for _ in range(30):
            allowed = cs.allowed_tokens(out).tolist()
            assert allowed, f"dead end at {tok.decode(out)!r}"
            if tok.eos_token_id in allowed and rng.random() < 0.4:
                v = int(tok.decode(out))
                assert 123 <= v <= 4567, v
                break
            non_eos = [t for t in allowed if t != tok.eos_token_id]
            if not non_eos:
                v = int(tok.decode(out))
                assert 123 <= v <= 4567, v
                break
            out.append(rng.choice(non_eos))


def test_enum_and_const():
    schema = {"type": "object", "properties": {"color": {"enum": ["red", "green"]}}}
    assert accepts(schema, '{"color":"red"}')
    assert accepts(schema, '{"color":"green"}')
    assert not accepts(schema, '{"color":"blue"}')
    schema2 = {"const": [1, 2]}
    assert accepts(schema2, "[1, 2]")
    assert not accepts(schema2, "[1,2,3]")


@pytest.mark.parametrize("overlap", [False, True])
def test_engine_constrained_generation(overlap):
    """End-to-end: random tiny model + schema mask -> valid JSON output."""
    from tpusgl.config import EngineConfig, ModelConfig
    from tpusgl.models import qwen2
    from tpusgl.ops.attention import ref_attention
    from tpusgl.runtime.engine import Engine
    from tpusgl.runtime.sampling_params import SamplingParams

    cfg = ModelConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=132,
        tie_word_embeddings=True, max_position_embeddings=512, rope_theta=10000.0,
    )
    ecfg = EngineConfig(
        max_total_tokens=512, max_requests=4,
        decode_bs_buckets=(1, 2, 4), prefill_len_buckets=(8, 16, 32, 64),
        kv_len_bucket=64,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    tok = CharTokenizer()
    engine = Engine(
        model_cfg=cfg, engine_cfg=ecfg, params=params, tokenizer=tok,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=cfg.vocab_size,
    )
    schema = {"type": "object", "properties": {"age": {"type": "integer"}},
              "required": ["age"]}
    # Sampling (fixed engine PRNG seed -> deterministic) rather than greedy:
    # a random greedy model can lock onto one digit forever (the schema
    # allows unbounded integers), truncating the JSON at max_new_tokens.
    # The repetition penalty further pushes toward the FSM's closing tokens.
    sp = SamplingParams(
        max_new_tokens=48, do_sample=True, temperature=1.0,
        eos_id=tok.eos_token_id, json_schema=schema, repetition_penalty=1.5,
    )
    prompt = [ord(c) for c in "give me json:"]
    out = engine.scheduler.run_batch([prompt], sp, overlap=overlap)[0]
    text = tok.decode([t for t in out if t != tok.eos_token_id])
    doc = json.loads(text)
    assert set(doc) == {"age"} and isinstance(doc["age"], int)
