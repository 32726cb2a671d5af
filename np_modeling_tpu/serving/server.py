"""OpenAI-compatible HTTP serving: continuous batching over HTTP.

Two layers, both stdlib-only (no web framework):

- :class:`CompletionScheduler` — the async batcher. ONE background
  thread owns the engine: it admits queued requests whenever slots and
  pages allow, runs lockstep ``step_many`` dispatches for everything
  live, feeds each request's termination machinery (EOS / stop
  sequences / max_tokens — reusing TextEngine's), and pushes text deltas
  into per-request event queues. Concurrent HTTP handlers therefore
  BATCH onto the same device dispatch — continuous batching across
  independent connections, the property that makes an LLM server pay.
- :class:`OpenAIServer` — a ``ThreadingHTTPServer`` speaking the
  de-facto API: ``POST /v1/completions``, ``POST /v1/chat/completions``
  (both with ``stream=true`` server-sent events), ``GET /v1/models``.
  Sampling fields (temperature/top_p/max_tokens/stop/seed-free
  penalties/logit_bias) map onto SamplingParams; per-request values
  need an engine built with ``per_request_sampling=True``.

Reference lineage: the reference has no serving tier (SURVEY.md §5);
the wire format follows the public OpenAI completions API.
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
import time
from typing import Callable, Optional

from np_modeling_tpu.serving.kv_cache import OutOfPagesError
from np_modeling_tpu.serving.sampling import SamplingParams
from np_modeling_tpu.serving.text import TextEngine, _LiveSeq


@dataclasses.dataclass
class _Request:
    prompt: str
    max_new_tokens: int
    stops: list
    sampling: Optional[SamplingParams]
    events: object                 # queue.Queue of ("delta", str) |
    #                                ("done", Completion) | ("error", str)
    seq: object = None             # _LiveSeq once admitted
    sid: int = -1
    emitted: int = 0
    holdback: int = 0
    constraint: Optional[str] = None   # engine grammar name (response_format)


class CompletionScheduler:
    """Background continuous-batching loop over a :class:`TextEngine`.

    ``submit`` is thread-safe and returns an event queue; the scheduler
    thread is the ONLY engine user (no locking around device state)."""

    def __init__(self, text: TextEngine):
        self.text = text
        self.engine = text.engine
        self._pending: "queue.Queue[_Request]" = queue.Queue()
        self._live: dict[int, _Request] = {}
        self._parked: list = []        # preempted; readmitted on retire
        self._grammars: "queue.Queue[tuple]" = queue.Queue()
        self._closing = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def register_constraint(self, name: str, dfa) -> None:
        """Thread-safe grammar registration: queued to the scheduler
        thread (the only engine user) and applied before the next
        admission, so a subsequent ``submit(constraint=name)`` from the
        same caller is ordered after it."""
        if self.engine.constraints is None:
            raise ValueError("engine built without constraints=; "
                             "grammar-constrained requests unavailable")
        self._grammars.put((name, dfa))

    def submit(self, prompt: str, max_new_tokens: int = 128, stop=None,
               sampling: Optional[SamplingParams] = None,
               constraint: Optional[str] = None):
        """Enqueue a completion; returns its event queue."""
        if self._closing:
            raise RuntimeError("scheduler is closed")
        if sampling is not None and not self.engine.per_request_sampling:
            raise ValueError(
                "per-request sampling fields need an engine built with "
                "per_request_sampling=True")
        if constraint is not None and self.engine.constraints is None:
            raise ValueError("engine built without constraints=; "
                             "grammar-constrained requests unavailable")
        stops = self.text._normalize_stops(stop)
        req = _Request(prompt, max_new_tokens, stops, sampling,
                       queue.Queue(), constraint=constraint)
        req.holdback = max((len(s) for s in stops), default=1) - 1
        self._pending.put(req)
        return req.events

    def close(self) -> None:
        self._closing = True
        self._thread.join(timeout=30)

    # ---- scheduler thread --------------------------------------------------

    def _loop(self) -> None:
        while not self._closing:
            try:
                if not self._live and self._parked:   # engine drained some
                    for req in self._parked:          # other way (error/
                        self._pending.put(req)        # finish): retry now
                    self._parked.clear()
                self._apply_grammars()
                self._admit()
                if not self._live:
                    time.sleep(0.005)
                    continue
                self._dispatch()
            except Exception as e:                      # deliver, don't die
                for req in list(self._live.values()):
                    req.events.put(("error", f"{type(e).__name__}: {e}"))
                    if req.sid in self.engine._slots:
                        self.engine.finish(req.sid)
                self._live.clear()
        # Shutdown: every in-flight, parked, and queued request gets a
        # terminal event — a blocked HTTP handler must never wait forever.
        for req in self._parked:
            req.events.put(("error", "server shutting down"))
        self._parked.clear()
        for req in list(self._live.values()):
            req.events.put(("error", "server shutting down"))
            if req.sid in self.engine._slots:
                self.engine.finish(req.sid)
        self._live.clear()
        while True:
            try:
                self._pending.get_nowait().events.put(
                    ("error", "server shutting down"))
            except queue.Empty:
                break

    def _apply_grammars(self) -> None:
        """Drain queued grammar registrations (scheduler thread only).
        Names are content hashes, so an already-registered name is a
        duplicate of the same grammar — skipped (replacement would raise
        while its user is live)."""
        while True:
            try:
                name, dfa = self._grammars.get_nowait()
            except queue.Empty:
                return
            if name not in self.engine._dfa_ids:
                self.engine.register_constraint(name, dfa)

    def _admit(self) -> None:
        while len(self.engine.live) < self.engine.max_seqs:
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                return
            try:
                req.sid = self.text._take_id()
                req.seq = _LiveSeq(self.text.tokenizer, req.max_new_tokens)
                first = self.engine.add_request(
                    req.sid, self.text._encode_prompt(req.prompt),
                    sampling=req.sampling, constraint=req.constraint)
            except OutOfPagesError as e:
                if not self.engine.live:
                    # Nothing live will ever free a page: the request is
                    # PERMANENTLY unservable (prompt >= capacity), not a
                    # transient shortage — fail it, don't requeue forever.
                    req.events.put(("error", str(e)))
                    continue
                self._pending.put(req)       # retry once pages free up
                return
            except Exception as e:
                req.events.put(("error", f"{type(e).__name__}: {e}"))
                continue
            self._live[req.sid] = req
            self.text._feed(req.seq, [first], req.stops)
            self._emit(req)
            self._retire_done()

    def _dispatch(self) -> None:
        # Lockstep step count + cap-exhaustion policy shared with the
        # synchronous path (TextEngine._dispatch_steps finishes the
        # engine slot; _retire_done then settles the event queue).
        seqs = {sid: r.seq for sid, r in self._live.items()}
        k = self.text._dispatch_steps(sorted(seqs), seqs)
        self._retire_done()
        if not self._live or k == 0:
            return
        try:
            try:
                out = self.engine.step_many(k)
            except OutOfPagesError:
                # Growth for k tokens didn't fit; a single step needs the
                # fewest new pages — make progress before preempting.
                out = self.engine.step_many(1)
        except OutOfPagesError as e:
            # Over-admission: page growth failed mid-decode (all-or-
            # nothing, engine state intact). PREEMPT the newest request —
            # PARK it to restart from its prompt once another request
            # retires (immediate readmission would livelock: it would
            # re-OOM before the survivors ever step). A lone request
            # can't free anything, so it errors out.
            newest = max(self._live)
            req = self._live.pop(newest)
            self.engine.finish(newest)
            if self._live:
                fresh = _Request(req.prompt, req.max_new_tokens, req.stops,
                                 req.sampling, req.events,
                                 constraint=req.constraint)
                fresh.holdback = req.holdback
                # Resume emission where the client left off: the greedy
                # re-decode reproduces the same prefix (sampled requests
                # restart best-effort — the engine RNG stream moved on).
                fresh.emitted = req.emitted
                self._parked.append(fresh)
            else:
                req.events.put(("error", str(e)))
            return
        for sid, toks in out.items():
            req = self._live.get(sid)
            if req is None:
                continue
            self.text._feed(req.seq, toks, req.stops)
            self._emit(req)
        self._retire_done()

    def _emit(self, req: _Request) -> None:
        """Push newly-safe text (stop-prefix holdback) to the consumer."""
        seq = req.seq
        safe = (len(seq.text) if seq.reason is not None
                else max(req.emitted, len(seq.text) - req.holdback))
        if safe > req.emitted:
            req.events.put(("delta", seq.text[req.emitted:safe]))
            req.emitted = safe

    def _retire_done(self) -> None:
        retired = False
        for sid in [s for s, r in self._live.items()
                    if r.seq.reason is not None]:
            req = self._live.pop(sid)
            if sid in self.engine._slots:
                self.engine.finish(sid)
            comp = self.text._finalize(req.seq, req.stops)
            if len(req.seq.text) > req.emitted:    # decoder flush remainder
                req.events.put(("delta", req.seq.text[req.emitted:]))
            req.events.put(("done", comp))
            retired = True
        if retired and self._parked:   # freed pages -> retry preempted
            for req in self._parked:
                self._pending.put(req)
            self._parked.clear()


def default_chat_template(messages) -> str:
    """Minimal role-tagged template; swap via OpenAIServer(chat_template=)."""
    lines = [f"{m['role']}: {m['content']}" for m in messages]
    return "\n".join(lines) + "\nassistant:"


class OpenAIServer:
    """OpenAI-compatible HTTP front end over a :class:`TextEngine`.

    ``server = OpenAIServer(text_engine, model='my-gpt'); server.start()``
    then POST ``/v1/completions`` / ``/v1/chat/completions`` (optionally
    ``"stream": true`` for SSE) against ``http://host:port``. ``port=0``
    picks a free port (read ``server.port``)."""

    def __init__(self, text: TextEngine, model: str = "np-modeling-tpu",
                 host: str = "127.0.0.1", port: int = 0,
                 chat_template: Callable = default_chat_template):
        self.scheduler = CompletionScheduler(text)
        self.model = model
        self.chat_template = chat_template
        self._httpd = None
        self._host, self._port = host, port
        self._thread = None
        self._toks = None              # lazy per-id token strings
        self._compiled: dict = {}      # grammar-name -> registered

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):        # quiet
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v1/models":
                    self._json(200, {"object": "list", "data": [
                        {"id": outer.model, "object": "model"}]})
                else:
                    self._json(404, {"error": {"message": "not found"}})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                except Exception as e:
                    return self._json(400, {"error": {"message": str(e)}})
                chat = self.path == "/v1/chat/completions"
                if not chat and self.path != "/v1/completions":
                    return self._json(404,
                                      {"error": {"message": "not found"}})
                try:
                    prompt = (outer.chat_template(body["messages"]) if chat
                              else body["prompt"])
                    sp = outer._sampling_from(body)
                    constraint = outer._constraint_from(body)
                    events = outer.scheduler.submit(
                        prompt,
                        max_new_tokens=int(body.get("max_tokens", 128)),
                        stop=body.get("stop"), sampling=sp,
                        constraint=constraint)
                except (KeyError, ValueError, TypeError) as e:
                    return self._json(400, {"error": {"message": str(e)}})
                if body.get("stream"):
                    self._stream(events, chat)
                else:
                    self._blocking(events, chat)

            def _blocking(self, events, chat: bool) -> None:
                text, comp = "", None
                while True:
                    kind, val = events.get()
                    if kind == "delta":
                        text += val
                    elif kind == "error":
                        return self._json(500,
                                          {"error": {"message": val}})
                    else:
                        comp = val
                        break
                choice = ({"index": 0, "message": {"role": "assistant",
                                                   "content": text},
                           "finish_reason": comp.finish_reason} if chat
                          else {"index": 0, "text": text,
                                "finish_reason": comp.finish_reason})
                self._json(200, {
                    "id": "cmpl-0",
                    "object": ("chat.completion" if chat
                               else "text_completion"),
                    "created": int(time.time()), "model": outer.model,
                    "choices": [choice],
                    "usage": {"completion_tokens": len(comp.tokens)}})

            def _stream(self, events, chat: bool) -> None:
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()

                def chunk(payload):
                    self.wfile.write(b"data: " + json.dumps(payload).encode()
                                     + b"\n\n")
                    self.wfile.flush()

                obj = ("chat.completion.chunk" if chat
                       else "text_completion")
                while True:
                    kind, val = events.get()
                    if kind == "delta":
                        choice = ({"index": 0, "delta": {"content": val},
                                   "finish_reason": None} if chat
                                  else {"index": 0, "text": val,
                                        "finish_reason": None})
                    elif kind == "error":
                        chunk({"error": {"message": val}})
                        break
                    else:
                        choice = ({"index": 0, "delta": {},
                                   "finish_reason": val.finish_reason}
                                  if chat else
                                  {"index": 0, "text": "",
                                   "finish_reason": val.finish_reason})
                        chunk({"id": "cmpl-0", "object": obj,
                               "model": outer.model, "choices": [choice]})
                        break
                    chunk({"id": "cmpl-0", "object": obj,
                           "model": outer.model, "choices": [choice]})
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def _token_strings(self) -> list:
        """Decoded text of every token id (vocab-indexed). Tokens that are
        not valid UTF-8 on their own (byte-level BPE mid-character splits)
        map to "" = never allowed — conservative but exact: the DFA walk
        is character-level, so such tokens cannot be matched reliably."""
        if self._toks is None:
            tok = self.scheduler.text.tokenizer
            V = self.scheduler.engine.gpt.config.vocab_size
            out = []
            for i in range(V):
                try:
                    out.append(tok.decode_bytes([i]).decode("utf-8"))
                except Exception:
                    out.append("")
            eos = self.scheduler.text.eos_id
            if eos is not None:
                out[eos] = ""            # EOS is DFA-terminal, never text
            self._toks = out
        return self._toks

    def _constraint_from(self, body: dict) -> Optional[str]:
        """Compile ``response_format`` into a named engine grammar.

        Supported: {"type": "text"} (none), {"type": "json_schema",
        "json_schema": {"schema": {...}}} (OpenAI structured outputs;
        a bare "schema" key is also accepted), and {"type": "regex",
        "regex": "..."}. Grammars are cached by content hash, so repeated
        requests with the same schema reuse the compiled DFA and the
        engine's recompiled dispatch."""
        rf = body.get("response_format")
        if not rf or rf.get("type") in (None, "text"):
            return None
        if self.scheduler.engine.constraints is None:
            raise ValueError(
                "this server's engine was built without constraints={}; "
                "response_format is unavailable")
        if self.scheduler.text.eos_id is None:
            raise ValueError("response_format needs the TextEngine's "
                             "eos_id to terminate the grammar")
        kind = rf.get("type")
        if kind == "json_schema":
            schema = ((rf.get("json_schema") or {}).get("schema")
                      if isinstance(rf.get("json_schema"), dict)
                      else None) or rf.get("schema")
            if not isinstance(schema, dict):
                raise ValueError('response_format json_schema needs '
                                 '{"json_schema": {"schema": {...}}}')
            key = "json:" + json.dumps(schema, sort_keys=True)
        elif kind == "regex":
            pattern = rf.get("regex")
            if not isinstance(pattern, str):
                raise ValueError('response_format regex needs '
                                 '{"regex": "..."}')
            key = "re:" + pattern
        else:
            raise ValueError(f"unsupported response_format type {kind!r}")
        import hashlib
        name = "rf-" + hashlib.sha1(key.encode()).hexdigest()[:16]
        if name not in self._compiled:
            from np_modeling_tpu.serving.constrain import (
                dfa_from_json_schema, dfa_from_regex)
            eos = self.scheduler.text.eos_id
            if kind == "json_schema":
                dfa = dfa_from_json_schema(schema, self._token_strings(),
                                           eos)
            else:
                dfa = dfa_from_regex(pattern, self._token_strings(), eos)
            self.scheduler.register_constraint(name, dfa)
            self._compiled[name] = True
        return name

    def _sampling_from(self, body: dict) -> Optional[SamplingParams]:
        fields = ("temperature", "top_p", "top_k", "min_p",
                  "repetition_penalty", "presence_penalty",
                  "frequency_penalty", "logit_bias")
        if not any(f in body for f in fields):
            return None
        lb = body.get("logit_bias")
        return SamplingParams(
            # OpenAI semantics: temperature defaults to 1.0 — a request
            # setting only top_p must NOT silently decode greedily.
            temperature=float(body.get("temperature", 1.0)),
            top_k=body.get("top_k"), top_p=body.get("top_p"),
            min_p=body.get("min_p"),
            repetition_penalty=float(body.get("repetition_penalty", 1.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            logit_bias=({int(k): float(v) for k, v in lb.items()}
                        if lb else None))

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        self.scheduler.close()
