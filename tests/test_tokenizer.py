"""Byte-level BPE tokenizer: HF GPT2Tokenizer parity, native == fallback."""

import json
import os

import pytest

from np_modeling_tpu.serving.tokenizer import (BPETokenizer,
                                               bytes_to_unicode)

TEXTS = [
    "Hello world!",
    "hello hello hellohello",
    "  leading and   multiple spaces ",
    "don't we'll they've I'm you're it's I'd",
    "numbers 123 456789 and mixed a1b2",
    "punct!? ... -- (brackets) [and] {more}",
    "tabs\tand\nnewlines\n\n  done",
    "unicode: café naïve 你好 über ☃",
    "",
    "a",
    "\n",
]


def _training_corpus():
    return " ".join(TEXTS) + " the quick brown fox jumps over the lazy dog"


def _build_vocab_and_merges(corpus: str, n_merges: int = 120):
    """Train a tiny byte-level BPE greedily (most frequent adjacent pair
    per round) — enough to give every TEXTS word a multi-merge path."""
    import regex
    from collections import Counter

    from np_modeling_tpu.serving.tokenizer import _PRETOKEN_PATTERN
    b2u = bytes_to_unicode()
    pretokens = [[b2u[b] for b in m.encode("utf-8")]
                 for m in regex.findall(_PRETOKEN_PATTERN, corpus)]
    vocab = {ch: i for i, ch in enumerate(sorted(b2u.values()))}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w in pretokens:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] += 1
        if not counts:
            break
        (a, b), c = counts.most_common(1)[0]
        if c < 2:
            break
        merges.append((a, b))
        vocab[a + b] = len(vocab)
        for w in pretokens:
            i = 0
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    w[i:i + 2] = [a + b]
                else:
                    i += 1
    return vocab, merges


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    vocab, merges = _build_vocab_and_merges(_training_corpus())
    d = tmp_path_factory.mktemp("bpe")
    vocab_json = os.path.join(d, "vocab.json")
    merges_txt = os.path.join(d, "merges.txt")
    with open(vocab_json, "w") as f:
        json.dump(vocab, f)
    with open(merges_txt, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vocab_json, merges_txt


@pytest.fixture(scope="module")
def hf_tok(tok_files):
    from transformers import GPT2Tokenizer
    return GPT2Tokenizer(*tok_files)


def test_matches_hf_gpt2_tokenizer(tok_files, hf_tok):
    ours = BPETokenizer.from_files(*tok_files)
    for text in TEXTS:
        assert ours.encode(text) == hf_tok.encode(text), text


def test_from_hf_constructor(hf_tok):
    ours = BPETokenizer.from_hf(hf_tok)
    for text in TEXTS:
        assert ours.encode(text) == hf_tok.encode(text), text


def test_decode_roundtrip(tok_files):
    ours = BPETokenizer.from_files(*tok_files)
    for text in TEXTS:
        assert ours.decode(ours.encode(text)) == text, text


def test_native_equals_python_fallback(tok_files):
    native = BPETokenizer.from_files(*tok_files, native=True)
    fallback = BPETokenizer.from_files(*tok_files, native=False)
    assert native._lib is not None and fallback._lib is None
    for text in TEXTS + [_training_corpus()]:
        assert native.encode(text) == fallback.encode(text), text


def test_real_gpt2_vocab_if_cached():
    """Full-size parity when the real GPT-2 tokenizer is in the HF cache
    (offline environments without it skip)."""
    from transformers import GPT2Tokenizer
    try:
        hf = GPT2Tokenizer.from_pretrained("gpt2")
    except Exception:
        pytest.skip("gpt2 tokenizer not cached and no network")
    ours = BPETokenizer.from_hf(hf)
    for text in TEXTS:
        assert ours.encode(text) == hf.encode(text), text


def test_two_native_tokenizers_coexist(tok_files, hf_tok):
    """Per-instance native handles: constructing a second tokenizer must
    not corrupt the first's encodes (regression: a process-global vocab)."""
    a = BPETokenizer.from_files(*tok_files, native=True)
    baseline = {t: a.encode(t) for t in TEXTS}
    # A second tokenizer with a DIFFERENT (empty-merge) vocabulary.
    from np_modeling_tpu.serving.tokenizer import bytes_to_unicode
    vocab = {ch: i for i, ch in enumerate(sorted(bytes_to_unicode().values()))}
    b = BPETokenizer(vocab, [], native=True)
    assert b.encode("hello") != baseline.get("hello")  # byte-level only
    a._cache.clear()                    # force re-encode through native
    for t in TEXTS:
        assert a.encode(t) == baseline[t], t


def test_cache_cap_bounds_memory(tok_files):
    tok = BPETokenizer.from_files(*tok_files)
    tok._cache_cap = 4
    for i in range(100):
        tok.encode(f"word{i} filler")
    assert len(tok._cache) <= 4 + 8     # cleared when over cap, then refills
