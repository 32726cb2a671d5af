"""Text in / text out serving on top of the paged GenerationEngine.

The reference framework stops at integer ids (its models consume token
arrays directly, /root/reference/train.py); a deployable serving stack
needs the text plane too. ``TextEngine`` glues the byte-level BPE
tokenizer to the continuous-batching engine:

- ``generate(prompts)``: batched text completion — encode, batched chunked
  prefill, lockstep ``step_many`` decode loops (one device dispatch per
  ``steps_per_dispatch`` tokens for the WHOLE batch), per-sequence EOS /
  stop-sequence / length termination, slots freed as sequences finish.
- ``stream(prompt)``: an iterator of text pieces for one prompt.

Both paths detokenize through a UTF-8-safe streaming decoder: byte-level
BPE freely splits one multi-byte character across token boundaries, so the
byte stream is buffered by an incremental UTF-8 decoder and only whole
characters are emitted (a naive per-token ``decode`` yields U+FFFD at
every such split). Stop sequences are matched on TEXT, straddling token
boundaries, and the streaming path holds back the longest stop-prefix so a
stop string is never partially emitted.
"""

from __future__ import annotations

import codecs
import dataclasses
from typing import Iterator, Optional

from np_modeling_tpu.serving.tokenizer import BPETokenizer


class StreamDecoder:
    """Incremental token-ids -> text decoder (UTF-8-safe).

    ``push`` returns the newly completed characters; bytes that end in a
    partial UTF-8 sequence stay buffered until the continuation arrives.
    ``flush`` force-decodes the remainder (dangling bytes become U+FFFD).
    """

    def __init__(self, tokenizer: BPETokenizer):
        self._tok = tokenizer
        self._utf8 = codecs.getincrementaldecoder("utf-8")(errors="replace")

    def push(self, token_id: int) -> str:
        return self._utf8.decode(self._tok.decode_bytes([token_id]))

    def flush(self) -> str:
        return self._utf8.decode(b"", final=True)


@dataclasses.dataclass
class Completion:
    """One finished request: the generated text (stop sequence and EOS
    excluded), the raw generated ids (including the EOS if one fired), and
    why generation ended ('eos' | 'stop' | 'length')."""

    text: str
    tokens: list
    finish_reason: str


class _LiveSeq:
    """Host-side decode state for one in-flight request."""

    __slots__ = ("decoder", "text", "tokens", "remaining", "reason")

    def __init__(self, tokenizer, max_new_tokens):
        self.decoder = StreamDecoder(tokenizer)
        self.text = ""
        self.tokens: list[int] = []
        self.remaining = max_new_tokens
        self.reason: Optional[str] = None


@dataclasses.dataclass
class TextEngine:
    """Tokenizer-backed text API over a :class:`GenerationEngine`.

    ``eos_id``: generation stops when the model emits it (excluded from
    the text). ``bos_id``: prepended to every prompt; also the fallback
    encoding of an empty prompt (GPT-2 convention: eos doubles as bos).
    The wrapped engine's sampling config (temperature/top-k/top-p) and
    multi-LoRA adapters apply unchanged.
    """

    engine: object               # serving.GenerationEngine
    tokenizer: BPETokenizer
    eos_id: Optional[int] = None
    bos_id: Optional[int] = None
    steps_per_dispatch: int = 8  # tokens per device dispatch (step_many);
                                 # amortizes this machine's ~45ms tunnel
                                 # round-trip per dispatch

    def __post_init__(self):
        self._next_id = 1 << 40  # avoid colliding with caller-managed ids

    # ---- public API ------------------------------------------------------

    def generate(self, prompts, max_new_tokens: int = 128, stop=None,
                 adapters=None):
        """Complete ``prompts`` (one string or a list). Returns text (a
        string for string input, else a list, prompt-ordered)."""
        single = isinstance(prompts, str)
        outs = self.complete([prompts] if single else prompts,
                             max_new_tokens, stop=stop, adapters=adapters)
        texts = [o.text for o in outs]
        return texts[0] if single else texts

    def complete(self, prompts: list, max_new_tokens: int = 128, stop=None,
                 adapters=None, speculative_gamma: Optional[int] = None
                 ) -> list[Completion]:
        """Batched completion with full per-request results.

        ``stop``: stop sequence(s) — generation of a request ends the
        moment its decoded text contains one (the stop text is excluded).
        ``adapters``: optional per-prompt LoRA adapter names (None = base).
        ``speculative_gamma``: with a draft-equipped engine, verify
        ``gamma`` draft tokens per round instead of plain decode."""
        stops = self._normalize_stops(stop)
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        ids = [self._take_id() for _ in prompts]
        enc = {sid: self._encode_prompt(p) for sid, p in zip(ids, prompts)}
        ad = (None if adapters is None else
              {sid: a for sid, a in zip(ids, adapters) if a is not None})
        live = {sid: _LiveSeq(self.tokenizer, max_new_tokens)
                for sid in ids}
        first = self.engine.add_requests(enc, ad)
        for sid, tok in first.items():
            self._feed(live[sid], [tok], stops)
        self._drain(live, stops, speculative_gamma)
        return [self._finalize(live[sid], stops) for sid in ids]

    def stream(self, prompt: str, max_new_tokens: int = 128, stop=None,
               adapter: Optional[str] = None) -> Iterator[str]:
        """Yield text pieces for one prompt as they decode. The
        concatenation of the pieces equals ``generate(prompt, ...)``; a
        stop sequence (or any prefix of one) is never emitted."""
        stops = self._normalize_stops(stop)
        holdback = max((len(s) for s in stops), default=1) - 1
        sid = self._take_id()
        seq = _LiveSeq(self.tokenizer, max_new_tokens)
        tok = self.engine.add_request(sid, self._encode_prompt(prompt),
                                      adapter)
        emitted = 0
        try:
            self._feed(seq, [tok], stops)
            while seq.reason is None:
                k = self._dispatch_steps([sid], {sid: seq})
                if k == 0:
                    break
                toks = self.engine.step_many(k)[sid]
                self._feed(seq, toks, stops)
                safe = len(seq.text) if seq.reason else max(
                    emitted, len(seq.text) - holdback)
                if safe > emitted:
                    yield seq.text[emitted:safe]
                    emitted = safe
        finally:
            if sid in self.engine._slots:    # cap-exhaustion already retired
                self.engine.finish(sid)
        self._finalize(seq, stops)
        if len(seq.text) > emitted:
            yield seq.text[emitted:]

    # ---- internals ---------------------------------------------------

    def _take_id(self) -> int:
        sid = self._next_id
        self._next_id += 1
        return sid

    def _encode_prompt(self, text: str) -> list[int]:
        toks = self.tokenizer.encode(text)
        if self.bos_id is not None:
            toks = [self.bos_id] + toks
        if not toks:
            if self.eos_id is None:
                raise ValueError(
                    "empty prompt needs bos_id or eos_id to seed decoding")
            toks = [self.eos_id]    # GPT-2 convention: eos doubles as bos
        return toks

    @staticmethod
    def _normalize_stops(stop) -> list[str]:
        if stop is None:
            return []
        stops = [stop] if isinstance(stop, str) else list(stop)
        assert all(s for s in stops), "empty stop sequence"
        return stops

    def _feed(self, seq: _LiveSeq, tokens, stops) -> None:
        """Run tokens through one sequence's termination machinery."""
        for tok in tokens:
            if seq.reason is not None:
                return
            seq.tokens.append(int(tok))
            if self.eos_id is not None and int(tok) == self.eos_id:
                seq.reason = "eos"
                return
            prev = len(seq.text)
            seq.text += seq.decoder.push(int(tok))
            seq.remaining -= 1
            if self._check_stop(seq, stops, prev):
                return
            if seq.remaining <= 0:
                seq.reason = "length"
                return

    @staticmethod
    def _check_stop(seq: _LiveSeq, stops, prev_len: int) -> bool:
        """Truncate at the earliest stop occurrence (which may straddle
        the newly added text)."""
        best = None
        for s in stops:
            idx = seq.text.find(s, max(0, prev_len - len(s) + 1))
            if idx != -1 and (best is None or idx < best):
                best = idx
        if best is None:
            return False
        seq.text = seq.text[:best]
        seq.reason = "stop"
        return True

    def _dispatch_steps(self, order, live) -> int:
        """Tokens to decode in the next device dispatch: lockstep over the
        still-running sequences, bounded by per-request budgets and each
        slot's remaining page-table capacity."""
        k = self.steps_per_dispatch
        for sid in order:
            seq = live[sid]
            if seq.reason is not None:
                continue
            cap = self.engine.capacity(sid)
            if cap <= 0:
                seq.reason = "length"
                self.engine.finish(sid)
                continue
            k = min(k, seq.remaining, cap)
        running = [s for s in order if live[s].reason is None]
        return k if running else 0

    def _drain(self, live: dict, stops, speculative_gamma) -> None:
        """Decode until every request terminates, retiring finished slots
        between dispatches (their pages go back to the pool)."""
        order = sorted(live)
        while True:
            k = self._dispatch_steps(order, live)
            if k == 0:
                return
            if speculative_gamma is not None and k > speculative_gamma:
                out = self.engine.step_speculative(speculative_gamma)
            else:
                out = self.engine.step_many(k)
            for sid, toks in out.items():
                self._feed(live[sid], toks, stops)
                if live[sid].reason is not None:
                    self.engine.finish(sid)

    def _finalize(self, seq: _LiveSeq, stops) -> Completion:
        prev = len(seq.text)
        tail = seq.decoder.flush()
        if tail and seq.reason != "stop":     # stop already truncated text
            seq.text += tail
            self._check_stop(seq, stops, prev)
        if seq.reason is None:
            seq.reason = "length"
        return Completion(seq.text, seq.tokens, seq.reason)
