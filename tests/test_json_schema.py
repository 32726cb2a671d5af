"""JSON-schema constrained decoding (VERDICT r3 #5): schemas compile to
char-level regex ASTs -> token DFAs; engine decodes emit ONLY schema-valid
JSON (``json.loads`` + ``jsonschema.validate`` as the oracle), exact
single-string languages are token-exact by construction, and the HTTP
server serves it through OpenAI's ``response_format``.

Reference lineage: the reference has no serving tier (SURVEY.md §5); the
surface follows the public structured-output APIs (OpenAI json_schema /
Outlines schema->regex->DFA).
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import jsonschema
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import (BPETokenizer, GenerationEngine,
                                     OpenAIServer, TextEngine,
                                     dfa_from_json_schema)
from np_modeling_tpu.serving.constrain import (_EMPTY, _deriv, _nullable,
                                               json_schema_ast)
from np_modeling_tpu.serving.tokenizer import bytes_to_unicode

rng = np.random.default_rng(11)


def _accepts(schema: dict, text: str) -> bool:
    """Char-level language oracle: Brzozowski-walk the schema's AST."""
    r = json_schema_ast(schema)
    for ch in text:
        r = _deriv(r, ch)
        if r == _EMPTY:
            return False
    return _nullable(r)


# ---------------------------------------------------------------------------
# Pure language tests (no engine): exact accept/reject per schema feature.
# ---------------------------------------------------------------------------


def test_object_required_and_optional_properties():
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"type": "boolean"}},
              "required": ["a"]}
    assert _accepts(schema, '{"a": 3}')
    assert _accepts(schema, '{"a":-10,"b":true}')
    assert _accepts(schema, '{"a": 0, "b": false}')
    assert not _accepts(schema, '{"b": true}')          # missing required
    assert not _accepts(schema, '{"a": 3,}')            # trailing comma
    assert not _accepts(schema, '{"a": 3, "b": 1}')     # wrong type
    assert not _accepts(schema, '{"a": 3.5}')           # integer, not number
    assert not _accepts(schema, '{"a": 03}')            # leading zero
    assert not _accepts(schema, '{"c": 1, "a": 3}')     # unknown key


def test_all_optional_object_allows_empty():
    schema = {"type": "object",
              "properties": {"x": {"type": "null"}}, "required": []}
    assert _accepts(schema, "{}")
    assert _accepts(schema, '{"x": null}')
    assert not _accepts(schema, '{,}')


def test_string_number_enum_const():
    assert _accepts({"type": "string"}, '"hi there"')
    assert _accepts({"type": "string"}, '"esc \\n \\u00fF"')
    assert not _accepts({"type": "string"}, '"unterminated')
    assert not _accepts({"type": "string"}, '"bad \\x"')
    num = {"type": "number"}
    for ok in ("0", "-1", "12.5", "1e9", "-0.5E-2"):
        assert _accepts(num, ok), ok
    for bad in ("01", "+1", ".5", "1.", "--2"):
        assert not _accepts(num, bad), bad
    enum = {"enum": ["red", "green", 3, True, None]}
    for ok in ('"red"', '"green"', "3", "true", "null"):
        assert _accepts(enum, ok), ok
    assert not _accepts(enum, '"blue"')
    assert _accepts({"const": {"k": [1]}}, '{"k": [1]}')


def test_array_bounds_and_anyof_and_ref():
    arr = {"type": "array", "items": {"type": "integer"},
           "minItems": 1, "maxItems": 3}
    assert _accepts(arr, "[1]")
    assert _accepts(arr, "[1, 2,3]")
    assert not _accepts(arr, "[]")
    assert not _accepts(arr, "[1,2,3,4]")
    assert _accepts({"type": "array", "items": {"type": "boolean"}}, "[]")
    any_of = {"anyOf": [{"type": "integer"}, {"type": "boolean"}]}
    assert _accepts(any_of, "true") and _accepts(any_of, "-7")
    assert not _accepts(any_of, '"x"')
    ref = {"$defs": {"pt": {"type": "object",
                            "properties": {"x": {"type": "integer"}},
                            "required": ["x"]}},
           "type": "array", "items": {"$ref": "#/$defs/pt"}, "maxItems": 2}
    assert _accepts(ref, '[{"x": 1}, {"x": 2}]')
    assert not _accepts(ref, '[{"y": 1}]')


def test_string_length_and_pattern():
    s = {"type": "string", "minLength": 2, "maxLength": 3}
    assert _accepts(s, '"ab"') and _accepts(s, '"abc"')
    assert not _accepts(s, '"a"') and not _accepts(s, '"abcd"')
    p = {"type": "string", "pattern": "[a-c]+[0-9]"}
    assert _accepts(p, '"abc7"')
    assert not _accepts(p, '"7abc"')


def test_unsupported_schema_raises():
    with pytest.raises(ValueError):
        json_schema_ast({"type": "object",
                         "properties": {"a": {"type": "integer"}},
                         "required": ["a", "zz"]})
    with pytest.raises(ValueError):
        json_schema_ast({"type": "frobnicate"})
    with pytest.raises(ValueError):
        json_schema_ast({"$ref": "#/nowhere/x"})


# ---------------------------------------------------------------------------
# Engine decodes (toy char vocabulary, test_constrain.py pattern).
# ---------------------------------------------------------------------------

TOKS = [""] + list('abcdefghiknorstuxy0123456789-. ,:"{}[]') + [
    "true", "false", "null", '":', ', "', '{"', "12"]
EOS = 0
V = 64
TOKS += [""] * (V - len(TOKS))


def _gpt():
    cfg = models.GPTConfig(vocab_size=V, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.integers(0, V, (1, 8))))
    return gpt, params


def _decode_text(eng, sid, prompt, max_steps=40, constraint=None):
    ids = [eng.add_request(sid, jnp.asarray(prompt), constraint=constraint)]
    while ids[-1] != EOS and len(ids) < max_steps:
        ids.append(eng.step()[sid])
    return ids, "".join(TOKS[t] for t in ids if t != EOS)


# Finite language (greedy + random weights would pad an unbounded integer
# with digits forever; real deployments cap via max_tokens).
SCHEMA = {"type": "object",
          "properties": {"ok": {"type": "boolean"},
                         "n": {"enum": [1, 2, 12]}},
          "required": ["ok"]}


def test_engine_emits_schema_valid_json():
    gpt, params = _gpt()
    dfa = dfa_from_json_schema(SCHEMA, TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=2, constraints={"s": dfa})
    for seed in (3, 4):
        ids, text = _decode_text(eng, seed, rng.integers(1, 40, (6,)),
                                 constraint="s")
        assert ids[-1] == EOS, f"did not terminate: {text!r}"
        doc = json.loads(text)
        jsonschema.validate(doc, SCHEMA)
        eng.finish(seed)


def test_single_string_language_is_token_exact():
    """A const schema's language is ONE string: the decode must emit
    exactly its tokens (per-step argmax over allowed = the unique legal
    continuation whenever only one token can extend the match — with this
    vocab the final text is exact even where multiple tokenizations
    exist)."""
    gpt, params = _gpt()
    schema = {"const": {"ok": True}}
    dfa = dfa_from_json_schema(schema, TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=2, constraints={"c": dfa})
    ids, text = _decode_text(eng, 1, rng.integers(1, 40, (5,)),
                             constraint="c")
    assert ids[-1] == EOS
    assert json.loads(text) == {"ok": True}


def test_unconstrained_slot_stays_token_exact_next_to_schema_slot():
    gpt, params = _gpt()
    dfa = dfa_from_json_schema(SCHEMA, TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=2, constraints={"s": dfa})
    ref = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=2)
    prompt_a = rng.integers(1, 40, (6,))
    prompt_b = rng.integers(1, 40, (6,))
    first_a = eng.add_request(10, jnp.asarray(prompt_a), constraint="s")
    first_b = eng.add_request(11, jnp.asarray(prompt_b))        # free slot
    ref_b = [ref.add_request(11, jnp.asarray(prompt_b))]
    got_b = [first_b]
    del first_a
    for _ in range(12):
        out = eng.step()
        if 11 in out:
            got_b.append(out[11])
        ref_b.append(ref.step()[11])
    assert got_b == ref_b[:len(got_b)]


def test_runtime_registration_matches_construction_time():
    """register_constraint (the HTTP server path) produces the same decode
    as an engine constructed with the grammar."""
    gpt, params = _gpt()
    dfa = dfa_from_json_schema(SCHEMA, TOKS, EOS)
    e1 = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                          max_seqs=2, constraints={"s": dfa})
    e2 = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                          max_seqs=2, constraints={})
    e2.register_constraint("s", dfa)
    prompt = rng.integers(1, 40, (6,))
    ids1, t1 = _decode_text(e1, 7, prompt, constraint="s")
    ids2, t2 = _decode_text(e2, 7, prompt, constraint="s")
    assert ids1 == ids2 and t1 == t2


# ---------------------------------------------------------------------------
# HTTP: response_format through the OpenAI server.
# ---------------------------------------------------------------------------


def _byte_tokenizer():
    vocab = {ch: i for i, ch in enumerate(
        bytes_to_unicode()[b] for b in range(256))}
    return BPETokenizer(vocab, [], native=False)


def _post(port, path, payload, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def schema_server():
    B_EOS = 256
    cfg = models.GPTConfig(vocab_size=B_EOS + 1, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    eng = GenerationEngine(gpt, params, total_pages=96, page_size=4,
                           max_seqs=4, constraints={})
    text = TextEngine(eng, _byte_tokenizer(), eos_id=B_EOS)
    srv = OpenAIServer(text, model="tiny-gpt")
    srv.start()
    yield srv
    srv.stop()


def test_http_json_schema_response_format(schema_server):
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"]}
    out = _post(schema_server.port, "/v1/completions", {
        "prompt": "emit json: ",
        "max_tokens": 48,
        "response_format": {"type": "json_schema",
                            "json_schema": {"name": "t",
                                            "schema": schema}}})
    text = out["choices"][0]["text"]
    jsonschema.validate(json.loads(text), schema)
    # Same schema again: cached grammar, same wire behavior.
    out2 = _post(schema_server.port, "/v1/completions", {
        "prompt": "emit json: ", "max_tokens": 48,
        "response_format": {"type": "json_schema", "schema": schema}})
    jsonschema.validate(json.loads(out2["choices"][0]["text"]), schema)


def test_http_regex_response_format(schema_server):
    import re
    out = _post(schema_server.port, "/v1/completions", {
        "prompt": "pick: ", "max_tokens": 16,
        "response_format": {"type": "regex", "regex": "(yes|no)"}})
    assert re.fullmatch("(yes|no)", out["choices"][0]["text"])


def test_http_response_format_errors(schema_server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(schema_server.port, "/v1/completions", {
            "prompt": "x", "response_format": {"type": "grammar_xyz"}})
    assert e.value.code == 400
