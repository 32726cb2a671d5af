"""TextEngine: text-plane serving over the paged engine.

Token parity vs the dense model decode, EOS / stop-sequence / length
termination, UTF-8-safe streaming detokenization, and stream==generate.
Uses a trivial byte-level tokenizer (256 byte tokens, no merges) so every
token is ONE byte — the worst case for UTF-8 splits and the easiest to
reason about for stop-sequence straddling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import (BPETokenizer, GenerationEngine,
                                     StreamDecoder, TextEngine)
from np_modeling_tpu.serving.tokenizer import bytes_to_unicode

rng = np.random.default_rng(7)

EOS = 256  # one id past the byte vocab


def _byte_tokenizer():
    vocab = {ch: i for i, ch in enumerate(
        bytes_to_unicode()[b] for b in range(256))}
    return BPETokenizer(vocab, [], native=False)


@pytest.fixture(scope="module")
def setup():
    cfg = models.GPTConfig(vocab_size=EOS + 1, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))
    return gpt, params, _byte_tokenizer()


def _engine(gpt, params, **kw):
    return GenerationEngine(gpt, params, total_pages=96, page_size=4,
                            max_seqs=4, **kw)


def _dense_tokens(gpt, params, tok, text, steps):
    prompt = jnp.asarray(tok.encode(text))[None, :]
    return [int(t) for t in np.asarray(
        gpt.generate(params, prompt, steps=steps))[0]]


def test_generate_matches_dense_decode(setup):
    gpt, params, tok = setup
    te = TextEngine(_engine(gpt, params), tok)
    text = te.generate("Hello wor", max_new_tokens=12)
    want = tok.decode(_dense_tokens(gpt, params, tok, "Hello wor", 12))
    assert text == want


def test_batch_matches_solo(setup):
    gpt, params, tok = setup
    prompts = ["Hello wor", "abc", "the quick brown"]
    te = TextEngine(_engine(gpt, params), tok)
    batch = te.generate(prompts, max_new_tokens=9)
    for p, got in zip(prompts, batch):
        solo = TextEngine(_engine(gpt, params), tok).generate(
            p, max_new_tokens=9)
        assert got == solo, p


def test_completion_details_and_length_reason(setup):
    gpt, params, tok = setup
    te = TextEngine(_engine(gpt, params), tok)
    (out,) = te.complete(["Hello wor"], max_new_tokens=10)
    assert out.finish_reason == "length"
    assert len(out.tokens) == 10
    assert out.tokens == _dense_tokens(gpt, params, tok, "Hello wor", 10)


def test_eos_truncates(setup):
    gpt, params, tok = setup
    toks = _dense_tokens(gpt, params, tok, "Hello wor", 16)
    # Re-run with eos_id = the 6th generated token: generation must stop
    # there, the eos excluded from the text but included in .tokens.
    eos = toks[5]
    first = toks.index(eos)
    te = TextEngine(_engine(gpt, params), tok, eos_id=eos)
    (out,) = te.complete(["Hello wor"], max_new_tokens=16)
    assert out.finish_reason == "eos"
    assert out.tokens == toks[:first + 1]
    assert out.text == tok.decode(toks[:first])


def test_stop_sequence_truncates(setup):
    gpt, params, tok = setup
    full = tok.decode(_dense_tokens(gpt, params, tok, "Hello wor", 16))
    stop = full[4:7]          # straddles tokens: every token is one byte
    te = TextEngine(_engine(gpt, params), tok)
    (out,) = te.complete(["Hello wor"], max_new_tokens=16, stop=stop)
    assert out.finish_reason == "stop"
    assert out.text == full[:full.find(stop)]
    assert stop not in out.text


def test_stream_equals_generate_and_holds_back_stops(setup):
    gpt, params, tok = setup
    te = TextEngine(_engine(gpt, params), tok, steps_per_dispatch=3)
    want = te.generate("Hello wor", max_new_tokens=14)
    stop = want[5:8]
    truncated = te.generate("Hello wor", max_new_tokens=14, stop=stop)

    pieces = list(te.stream("Hello wor", max_new_tokens=14, stop=stop))
    assert "".join(pieces) == truncated
    # No emitted prefix may ever contain the stop string.
    acc = ""
    for p in pieces:
        acc += p
        assert stop not in acc

    pieces = list(te.stream("Hello wor", max_new_tokens=14))
    assert "".join(pieces) == want


def test_stream_decoder_utf8_split():
    tok = _byte_tokenizer()
    sd = StreamDecoder(tok)
    text = "héllo 你好 ☃"
    out = []
    for b in text.encode("utf-8"):
        piece = sd.push(int(tok._byte_ids[b]))
        assert "�" not in piece     # partial chars stay buffered
        out.append(piece)
    assert "".join(out) + sd.flush() == text

    # A dangling partial sequence becomes U+FFFD only on flush.
    sd = StreamDecoder(tok)
    first = "你".encode("utf-8")[0]
    assert sd.push(int(tok._byte_ids[first])) == ""
    assert sd.flush() == "�"


def test_empty_prompt_needs_seed(setup):
    gpt, params, tok = setup
    te = TextEngine(_engine(gpt, params), tok)
    with pytest.raises(ValueError):
        te.generate("", max_new_tokens=2)
    te = TextEngine(_engine(gpt, params), tok, eos_id=EOS)
    out = te.complete([""], max_new_tokens=3)[0]
    assert len(out.tokens) == 3          # seeded from eos (GPT-2 style)


def test_capacity_bounds_generation(setup):
    gpt, params, tok = setup
    te = TextEngine(_engine(gpt, params), tok)
    prompt = "x" * 90                     # max_len 96 -> 6 decode steps
    (out,) = te.complete([prompt], max_new_tokens=50)
    assert out.finish_reason == "length"
    assert len(out.tokens) == 7           # prefill token + 6 capacity steps
    assert not te.engine.live             # slot retired


def test_multi_byte_prompt_roundtrip(setup):
    gpt, params, tok = setup
    te = TextEngine(_engine(gpt, params), tok)
    # Multi-byte prompt encodes/decodes exactly; generation runs on it.
    text = te.generate("naïve ☃", max_new_tokens=4)
    assert isinstance(text, str)
    assert tok.decode(tok.encode("naïve ☃")) == "naïve ☃"
