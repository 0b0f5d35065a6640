"""Generate the committed tiny REAL-tokenizer checkpoint (VERDICT r3 #9).

Zero-egress stand-in for a pretrained snapshot
(/root/reference/engine.py:17-20 pulls Qwen from the HF hub): a genuine
byte-level-BPE tokenizer TRAINED here (tokenizers library — same machinery
as Qwen2's tokenizer.json, ~16k vocab with real merges, ChatML chat
template) plus a 2-layer random-weight Qwen2 model saved in HF safetensors
layout. CI drives string-in/string-out generation, the chat template, and
the constrained-decoding token trie against this real vocab
(tests/test_real_checkpoint.py).

Deterministic: rerunning reproduces byte-identical assets (seeded corpus,
sorted training). Output: tests/assets/tiny_qwen2/.
"""

from __future__ import annotations

import json
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "tiny_qwen2")
VOCAB = 16384

SYLLABLES = [
    "an", "ba", "co", "da", "el", "fi", "ga", "ho", "in", "ja", "ku", "lo",
    "ma", "ne", "or", "pa", "qu", "ra", "su", "ti", "un", "va", "wo", "xy",
    "ze", "th", "sh", "ch", "st", "er", "ing", "ed", "ly", "tion", "ment",
]
COMMON = (
    "the of and to in a is that it was for on are as with his they at be "
    "this have from or had by word but what some we can out other were all "
    "there when up use your how said an each she which do their time if "
    "will way about many then them write would like so these her long make "
    "thing see him two has look more day could go come did number sound no "
    "most people my over know water than call first who may down side been "
    "now find any new work part take get place made live where after back "
    "little only round man year came show every good me give our under name"
).split()


def words(rng, n):
    out = []
    for _ in range(n):
        if rng.random() < 0.6:
            out.append(rng.choice(COMMON))
        else:
            w = "".join(rng.choice(SYLLABLES)
                        for _ in range(rng.randint(1, 4)))
            out.append(w)
    return out


def corpus_lines(seed=0, n_lines=60_000):
    rng = random.Random(seed)
    for i in range(n_lines):
        kind = i % 10
        if kind < 6:  # prose
            ws = words(rng, rng.randint(5, 20))
            if rng.random() < 0.5:
                ws[0] = ws[0].capitalize()
            yield " ".join(ws) + rng.choice([".", "?", "!", ",", ";"])
        elif kind < 8:  # json-ish
            doc = {
                rng.choice(COMMON): rng.choice(
                    [rng.randint(0, 9999), True, False, None,
                     " ".join(words(rng, 2))]
                )
                for _ in range(rng.randint(1, 4))
            }
            yield json.dumps(doc)
        elif kind == 8:  # code-ish
            a, b = words(rng, 2)
            yield f"def {a}_{b}(x, y={rng.randint(0, 99)}):\n    return x + y"
        else:  # numbers / punctuation soup
            yield " ".join(str(rng.randint(-1000, 10**rng.randint(1, 6)))
                           for _ in range(rng.randint(3, 8)))


def build_tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=VOCAB,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(corpus_lines(), trainer)
    return tok


CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def main():
    import jax
    import jax.numpy as jnp

    from tpusgl.config import ModelConfig
    from tpusgl.loader.safetensors_loader import save_params_hf_layout
    from tpusgl.models import qwen2

    os.makedirs(OUT, exist_ok=True)
    tok = build_tokenizer()
    vocab_size = tok.get_vocab_size()
    print("trained vocab:", vocab_size)
    tok.save(os.path.join(OUT, "tokenizer.json"))
    with open(os.path.join(OUT, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "bos_token": None,
                "eos_token": "<|im_end|>",
                "pad_token": "<|endoftext|>",
                "chat_template": CHAT_TEMPLATE,
                "model_max_length": 2048,
            },
            f, indent=1,
        )

    cfg = ModelConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=vocab_size,
        tie_word_embeddings=True, max_position_embeddings=2048,
        rope_theta=10000.0,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(1234), jnp.float32)
    save_params_hf_layout(params, cfg, OUT)
    with open(os.path.join(OUT, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": int(tok.token_to_id("<|im_end|>"))}, f)
    size = sum(
        os.path.getsize(os.path.join(OUT, f)) for f in os.listdir(OUT)
    )
    print(f"wrote {OUT} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
