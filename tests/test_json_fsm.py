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
    _step,
)


def accepts(schema, text):
    stack = (("val", _freeze(schema or {})),)
    for c in text:
        stack = _step(stack, c)
        if stack is None:
            return False
    return _can_end(stack)


SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 2},
        "active": {"type": "boolean"},
    },
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
    schema = {"type": "object", "properties": {"age": {"type": "integer"}}}
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
