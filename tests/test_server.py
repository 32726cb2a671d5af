"""OpenAI-compatible HTTP server: wire-format, streaming SSE, continuous
batching across concurrent connections, and text parity vs TextEngine.

Reference lineage: the reference has no serving tier (SURVEY.md §5);
the wire format follows the public OpenAI completions API.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import (BPETokenizer, GenerationEngine,
                                     OpenAIServer, TextEngine)
from np_modeling_tpu.serving.tokenizer import bytes_to_unicode

rng = np.random.default_rng(9)
EOS = 256


def _byte_tokenizer():
    vocab = {ch: i for i, ch in enumerate(
        bytes_to_unicode()[b] for b in range(256))}
    return BPETokenizer(vocab, [], native=False)


@pytest.fixture(scope="module")
def server():
    cfg = models.GPTConfig(vocab_size=EOS + 1, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    eng = GenerationEngine(gpt, params, total_pages=96, page_size=4,
                           max_seqs=4, per_request_sampling=True)
    text = TextEngine(eng, _byte_tokenizer(), eos_id=EOS)
    srv = OpenAIServer(text, model="tiny-gpt")
    srv.start()
    # A reference TextEngine on ITS OWN engine for parity decodes.
    ref = TextEngine(GenerationEngine(gpt, params, total_pages=96,
                                      page_size=4, max_seqs=4),
                     _byte_tokenizer(), eos_id=EOS)
    yield srv, ref
    srv.stop()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _post_stream(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if not line or not line.startswith(b"data: "):
                continue
            body = line[len(b"data: "):]
            if body == b"[DONE]":
                break
            chunks.append(json.loads(body))
    return chunks


def test_models_endpoint(server):
    srv, _ = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v1/models", timeout=30) as r:
        data = json.loads(r.read())
    assert data["data"][0]["id"] == "tiny-gpt"


def test_completion_matches_text_engine(server):
    srv, ref = server
    want = ref.generate("Hello wor", max_new_tokens=10)
    got = _post(srv.port, "/v1/completions",
                {"prompt": "Hello wor", "max_tokens": 10})
    assert got["choices"][0]["text"] == want
    assert got["object"] == "text_completion"
    assert got["choices"][0]["finish_reason"] in ("length", "eos", "stop")
    assert got["usage"]["completion_tokens"] >= 1


def test_streaming_concat_equals_blocking(server):
    srv, ref = server
    want = ref.generate("abc", max_new_tokens=8)
    chunks = _post_stream(srv.port, "/v1/completions",
                          {"prompt": "abc", "max_tokens": 8,
                           "stream": True})
    text = "".join(c["choices"][0]["text"] for c in chunks)
    assert text == want
    assert chunks[-1]["choices"][0]["finish_reason"] is not None


def test_chat_completions(server):
    srv, ref = server
    msgs = [{"role": "user", "content": "hi"}]
    got = _post(srv.port, "/v1/chat/completions",
                {"messages": msgs, "max_tokens": 6})
    assert got["object"] == "chat.completion"
    want = ref.generate("user: hi\nassistant:", max_new_tokens=6)
    assert got["choices"][0]["message"]["content"] == want


def test_concurrent_requests_batch_and_match(server):
    """N concurrent HTTP clients; each response must equal its own solo
    TextEngine decode (continuous batching must not cross-contaminate)."""
    srv, ref = server
    prompts = ["Hello wor", "abc", "zq", "The "]
    wants = [ref.generate(p, max_new_tokens=8) for p in prompts]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = _post(srv.port, "/v1/completions",
                           {"prompt": prompts[i], "max_tokens": 8})

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        assert r["choices"][0]["text"] == wants[i], prompts[i]


def test_stop_sequence_and_sampling_fields(server):
    srv, ref = server
    want = ref.generate("Hello wor", max_new_tokens=12)
    if len(want) > 2:
        stop = want[1:3]
        got = _post(srv.port, "/v1/completions",
                    {"prompt": "Hello wor", "max_tokens": 12,
                     "stop": [stop]})
        assert stop not in got["choices"][0]["text"]
    # Sampling fields route through SamplingParams (per-request engine).
    got = _post(srv.port, "/v1/completions",
                {"prompt": "abc", "max_tokens": 6, "temperature": 0.9,
                 "top_k": 8, "presence_penalty": 0.5})
    assert isinstance(got["choices"][0]["text"], str)


def _tiny_text(total_pages=96, max_seqs=4, max_len=96, **kw):
    cfg = models.GPTConfig(vocab_size=EOS + 1, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=max_len)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    eng = GenerationEngine(gpt, params, total_pages=total_pages, page_size=4,
                           max_seqs=max_seqs, **kw)
    return TextEngine(eng, _byte_tokenizer(), eos_id=EOS)


def _drain(events, timeout=120):
    text, terminal = "", None
    import queue as _q
    while terminal is None:
        kind, val = events.get(timeout=timeout)
        if kind == "delta":
            text += val
        else:
            terminal = (kind, val)
    return text, terminal


def test_unservable_prompt_errors_instead_of_hanging():
    """A prompt exceeding per-sequence capacity must produce an error
    event, not an infinite requeue loop."""
    from np_modeling_tpu.serving import CompletionScheduler
    text = _tiny_text(max_len=16)
    sched = CompletionScheduler(text)
    try:
        events = sched.submit("x" * 40, max_new_tokens=4)
        _, (kind, val) = _drain(events, timeout=60)
        assert kind == "error" and "capacity" in val.lower() or "16" in val
    finally:
        sched.close()


def test_page_pressure_preempts_not_fails():
    """Admitted requests that outgrow the page pool are preempted and
    requeued (greedy restart), so every request still completes with the
    correct text instead of the whole batch erroring."""
    from np_modeling_tpu.serving import CompletionScheduler
    text = _tiny_text(total_pages=10, max_seqs=4, max_len=48)
    ref = _tiny_text(total_pages=96, max_seqs=4, max_len=48)
    prompts = ["Hello w", "abcdef", "zq jk"]
    wants = [ref.generate(p, max_new_tokens=10) for p in prompts]
    sched = CompletionScheduler(text)
    try:
        evs = [sched.submit(p, max_new_tokens=10) for p in prompts]
        for i, ev in enumerate(evs):
            got, (kind, comp) = _drain(ev, timeout=180)
            assert kind == "done", (kind, comp)
            assert got == wants[i], prompts[i]
    finally:
        sched.close()


def test_shutdown_delivers_terminal_event():
    from np_modeling_tpu.serving import CompletionScheduler
    text = _tiny_text()
    sched = CompletionScheduler(text)
    events = sched.submit("Hello", max_new_tokens=64)
    sched.close()
    _, (kind, val) = _drain(events, timeout=60)
    assert kind in ("done", "error")


def test_choices_empty_rejected():
    from np_modeling_tpu.serving import dfa_from_choices
    with pytest.raises(ValueError, match="non-empty"):
        dfa_from_choices([], 64, 0)


def test_bad_request_is_400(server):
    srv, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/completions",
        data=json.dumps({"max_tokens": 4}).encode(),   # no prompt
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
