"""Grammar-constrained decoding: regex/choice DFAs must make the engine
emit ONLY grammar-accepted strings, verified against Python's ``re`` as
the language oracle, while unconstrained slots sharing the dispatch stay
token-exact vs a constraint-free engine.

Reference lineage: the reference has no serving tier (SURVEY.md §5);
the scheme follows the public structured-output designs (token-level
DFA masks compiled offline, stepped in-graph).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import models
from np_modeling_tpu.serving import (GenerationEngine, SamplingParams,
                                     dfa_from_choices, dfa_from_regex)

rng = np.random.default_rng(5)

# Toy char vocabulary: id 0 = EOS (empty string), ids 1.. = single chars
# and a few multi-char merges — enough to exercise multi-char token walks.
TOKS = [""] + list("abcdefgh0123456789-. ") + ["ab", "cd", "12", "true",
                                               "false", "0.5"]
EOS = 0
V = 64                                  # model vocab (>= len(TOKS); the
TOKS += [""] * (V - len(TOKS))          # padding ids are never allowed)


def _gpt():
    cfg = models.GPTConfig(vocab_size=V, d_model=32, num_heads=4,
                           num_kv_heads=2, num_layers=2, hidden_units=64,
                           max_len=96)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.integers(0, V, (1, 8))))
    return gpt, params


def _decode_text(eng, sid, prompt, max_steps=24, constraint=None):
    """Decode until EOS (or cap); return (token ids, decoded text)."""
    ids = [eng.add_request(sid, jnp.asarray(prompt), constraint=constraint)]
    while ids[-1] != EOS and len(ids) < max_steps:
        ids.append(eng.step()[sid])
    text = "".join(TOKS[t] for t in ids if t != EOS)
    return ids, text


@pytest.mark.parametrize("pattern", ["(true|false)", "-?[0-9]+(.[0-9]+)?",
                                     "ab*(cd)+", "[a-d] [e-h]"])
def test_greedy_output_matches_grammar(pattern):
    """EOS gets a large logit bias, so the decode terminates at the FIRST
    accepting state (infinite languages would otherwise legally repeat
    forever) — and the masked -inf must win over the bias in
    non-accepting states (bias/constraint composition)."""
    gpt, params = _gpt()
    dfa = dfa_from_regex(pattern, TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           constraints={"g": dfa},
                           sampling=SamplingParams(logit_bias={EOS: 1e4}))
    ids, text = _decode_text(eng, 0, rng.integers(0, V, (6,)), constraint="g")
    assert ids[-1] == EOS, (pattern, ids)         # terminated via grammar
    gold = re.compile("^(?:" + pattern.replace("(", "(?:") + ")$", re.S)
    assert gold.match(text), (pattern, text, ids)


def test_sampled_output_matches_grammar():
    """Constraint masks survive the full sampling processor chain."""
    gpt, params = _gpt()
    dfa = dfa_from_regex("[0-9]+", TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           constraints={"num": dfa},
                           sampling=SamplingParams(temperature=1.5, top_k=20,
                                                   repetition_penalty=1.2))
    ids, text = _decode_text(eng, 0, rng.integers(0, V, (5,)),
                             constraint="num")
    body = [t for t in ids if t != EOS]
    assert body and all(TOKS[t] and all(c in "0123456789" for c in TOKS[t])
                        for t in body), (ids, text)


def test_choices_constraint():
    gpt, params = _gpt()
    choices = [[TOKS.index("true")], [TOKS.index("false")],
               [TOKS.index("ab"), TOKS.index("cd")]]
    dfa = dfa_from_choices(choices, V, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           constraints={"c": dfa})
    ids, text = _decode_text(eng, 0, rng.integers(0, V, (7,)), constraint="c")
    assert text in ("true", "false", "abcd"), (ids, text)
    assert ids[-1] == EOS


def test_unconstrained_slots_unaffected():
    """A constrained and an unconstrained request share the dispatch; the
    unconstrained one is token-exact vs a constraint-free engine."""
    gpt, params = _gpt()
    p0 = rng.integers(0, V, (6,))
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    want = [plain.add_request(0, jnp.asarray(p0))]
    want += plain.step_many(6)[0]

    dfa = dfa_from_regex("[0-9]+", TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, constraints={"num": dfa})
    firsts = eng.add_requests({0: jnp.asarray(p0),
                               1: jnp.asarray(rng.integers(0, V, (5,)))},
                              constraints={1: "num"})
    got = [firsts[0]]
    digit_ids = [firsts[1]]
    for _ in range(6):
        out = eng.step()
        got.append(out[0])
        digit_ids.append(out[1])
    assert got == want
    live = [t for t in digit_ids if t != EOS]
    cut = live[:live.index(EOS)] if EOS in live else live
    assert all(all(c in "0123456789" for c in TOKS[t]) for t in cut)


def test_constraint_fork_finish_and_slot_reuse():
    gpt, params = _gpt()
    dfa = dfa_from_regex("(true|false)", TOKS, EOS)
    eng = GenerationEngine(gpt, params, total_pages=64, page_size=4,
                           max_seqs=4, constraints={"b": dfa})
    prompt = rng.integers(0, V, (5,))
    eng.add_request(0, jnp.asarray(prompt), constraint="b")
    eng.fork(0, 1)
    out = eng.step()
    assert out[0] == out[1]          # child continues the grammar position
    eng.finish(0)
    eng.finish(1)
    # Reused slot decodes unconstrained, token-exact vs a plain engine.
    plain = GenerationEngine(gpt, params, total_pages=64, page_size=4)
    assert (eng.add_request(2, jnp.asarray(prompt))
            == plain.add_request(0, jnp.asarray(prompt)))
    assert eng.step()[2] == plain.step()[0]


def test_constraint_errors():
    gpt, params = _gpt()
    eng = GenerationEngine(gpt, params, total_pages=32, page_size=4)
    with pytest.raises(ValueError, match="constraints="):
        eng.add_request(0, jnp.asarray(rng.integers(0, V, (4,))),
                        constraint="x")
    dfa = dfa_from_regex("a+", TOKS, EOS)
    eng2 = GenerationEngine(gpt, params, total_pages=32, page_size=4,
                            constraints={"a": dfa})
    with pytest.raises(ValueError, match="unknown constraint"):
        eng2.add_request(0, jnp.asarray(rng.integers(0, V, (4,))),
                         constraint="nope")


def test_dfa_language_equivalence_exhaustive():
    """Enumerate every token string the DFA accepts (to a depth) and check
    each against Python re; also check DFA coverage: every accepted short
    string over the vocab is reachable."""
    pattern = "-?[0-9]+(.[0-9]+)?"
    dfa = dfa_from_regex(pattern, TOKS, EOS)
    gold = re.compile("^(?:" + pattern.replace("(", "(?:") + ")$", re.S)
    out, stack = [], [(dfa.start, ())]
    while stack:
        s, seq = stack.pop()
        row = dfa.trans[s]
        for t in range(V):
            if row[t] < 0:
                continue
            if t == EOS:
                out.append(seq)
            elif len(seq) < 3:
                stack.append((int(row[t]), seq + (t,)))
    assert out
    for seq in out:
        text = "".join(TOKS[t] for t in seq)
        assert gold.match(text), (seq, text)
    texts = {"".join(TOKS[t] for t in seq) for seq in out}
    assert {"1", "-1", "0.5", "12", "1.5"} <= texts