"""HTTP serving front door: an OpenAI-style completions endpoint.

Stdlib-only (``http.server`` + threads — no new dependencies), sitting on
top of :class:`serve.engine.Engine`:

* ``POST /v1/completions`` — ``{"prompt": [ids] | "text", "max_tokens",
  "temperature", "top_k", "top_p", "min_p", "repetition_penalty",
  "presence_penalty", "frequency_penalty", "logit_bias": {"id": bias},
  "stop": [ids], "seed": int, "n": int, "logprobs": bool,
  "stream": bool}``.  String prompts need the server to be constructed
  with a tokenizer (anything with ``encode(str) -> ids`` /
  ``decode(ids) -> str`` — a HF tokenizer fits).  ``seed`` makes the
  response reproducible (choice ``i`` of ``n`` uses ``seed + i``).
* ``POST /v1/chat/completions`` — same sampling fields with
  ``"messages": [{"role", "content"}, ...]``.  The prompt is rendered by
  the tokenizer's ``apply_chat_template`` when it has one (HF
  tokenizers), else by a minimal generic template; responses carry the
  OpenAI chat shape (``message.content``; streaming sends
  ``delta.content`` chunks).
* ``GET /v1/models`` and ``GET /health``.
* ``"stream": true`` responds with server-sent events (one ``data:`` JSON
  line per token, then ``data: [DONE]``), fed by the engine's
  ``on_token`` streaming callback.

Scheduling: HTTP handler threads enqueue requests; ONE dispatcher thread
drains the queue and runs each wave as a single ``Engine.generate`` call
with **per-request SamplingParams** — so concurrent requests with
different temperatures/budgets share one compiled decode program and the
engine's continuous batching (slot refill) handles intra-wave length
variance.  Requests arriving while a wave runs JOIN IT IN FLIGHT through
the engine's ``admit`` hook whenever a slot frees up (cross-request
continuous batching) — provided the running call's compiled machinery
can serve them (``Engine.admissible``); the rest lead the next wave.
TPU work stays on the dispatcher thread; handler threads only tokenize,
wait, and serialize.

The reference package serves nothing (it is a dequantization kernel —
SURVEY.md §2); this module exists because a standalone serving framework
needs a network boundary, and it doubles as the end-to-end exercise of
the per-request sampling machinery.
"""

from __future__ import annotations

import json
import queue
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

from .engine import Engine
from .sampling import SamplingParams

__all__ = ["CompletionServer", "serve_http"]


@dataclass
class _Pending:
    """One queued completion request and its rendezvous state."""

    tokens: List[int]
    params: SamplingParams
    logprobs: bool
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[str] = None
    # Streaming: tokens are pushed here as emitted; None terminates.
    stream_q: Optional[queue.Queue] = None
    # Multi-LoRA: bank index of the adapter serving this request (None =
    # the bare base model).  Set from the request's "model" field.
    adapter: Optional[int] = None
    # OpenAI "echo": include the prompt (and, with logprobs, its
    # teacher-forced logprobs) in the response.  max_tokens=0 + echo is
    # the pure scoring idiom.
    echo: bool = False
    prompt_logprobs: Any = None
    # Set when the client goes away (a streaming handler's socket write
    # failed); the dispatcher's cancel callback reports it to the engine,
    # which frees the slot within one decode chunk.
    cancelled: bool = False


def _params_from_body(
    body: Dict[str, Any], seed_offset: int = 0
) -> SamplingParams:
    seed = body.get("seed")
    # OpenAI wire formats: classic completions take an INTEGER "logprobs"
    # (top-k alternatives per position); chat takes "logprobs": true plus
    # "top_logprobs": k.  A bare true records only the chosen token's
    # logprob (the engine's return_logprobs) with no alternatives.
    lp = body.get("logprobs", 0)
    top_k_lp = int(body.get("top_logprobs", 0) or 0)
    if not isinstance(lp, bool) and isinstance(lp, int):
        top_k_lp = max(top_k_lp, lp)
    return SamplingParams(
        temperature=float(body.get("temperature", 0.0)),
        top_k=int(body.get("top_k", 0)),
        top_p=float(body.get("top_p", 1.0)),
        min_p=float(body.get("min_p", 0.0)),
        repetition_penalty=float(body.get("repetition_penalty", 1.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        # OpenAI wire format: {"<token_id>": bias} (JSON keys are strings).
        logit_bias=tuple(
            sorted(
                (int(t), float(b))
                for t, b in (body.get("logit_bias") or {}).items()
            )
        ),
        stop_tokens=tuple(body.get("stop", ()) or ()),
        max_new_tokens=int(body.get("max_tokens", 64)),
        min_new_tokens=int(body.get("min_tokens", 0) or 0),
        # "n" completions with a seed get distinct derived seeds so the
        # whole response is reproducible; unseeded choices diverge through
        # the engine's shared key stream.
        seed=None if seed is None else int(seed) + seed_offset,
        top_logprobs=top_k_lp,
    )


class CompletionServer:
    """Engine + dispatcher + HTTP server (see module docstring).

    ``tokenizer`` is optional; without it, prompts must be token-id
    lists and responses carry only token ids.
    """

    def __init__(
        self,
        engine: Engine,
        tokenizer=None,
        model_name: str = "nf4-tpu",
        max_wave: int = 64,
        adapters: Optional[Dict[str, int]] = None,
        batch_window: float = 0.01,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.max_wave = max_wave
        # Dynamic-batching grace: after the first request of a FRESH wave,
        # wait up to this long (seconds) for more to arrive before
        # launching.  A near-simultaneous burst then starts as ONE wave —
        # grouped prefills instead of N single-slot admission prefills,
        # and the engine's shared-prefix cache can engage (it needs >= 2
        # prompts at call start).  Costs at most this much extra TTFT for
        # a lone request; deferred requests from a previous wave skip it.
        self.batch_window = batch_window
        # Multi-LoRA model multiplexing: map OpenAI "model" names to bank
        # indices of an Engine(lora_bank=...) — each fine-tune is its own
        # served model id, all multiplexed over ONE frozen 4-bit base
        # (requests for different models batch into the same wave).
        self.adapters = dict(adapters or {})
        if self.adapters:
            assert getattr(engine, "_bank", None) is not None, (
                "adapters= requires an Engine built with lora_bank=..."
            )
            n = engine.num_adapters
            bad = {k: v for k, v in self.adapters.items() if not 0 <= v < n}
            assert not bad, f"adapter indices out of range [0, {n}): {bad}"
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._shutdown = threading.Event()
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, name="nf4-dispatcher", daemon=True
        )
        self._httpd: Optional[ThreadingHTTPServer] = None
        self.stats = {
            "requests": 0, "waves": 0, "tokens_out": 0, "admitted": 0,
            "cancelled": 0,
        }

    # -- dispatcher ---------------------------------------------------------

    def _dispatch_loop(self):
        import time as _time

        carry: List[_Pending] = []  # deferred by the previous wave
        while not self._shutdown.is_set():
            wave = carry
            carry = []
            fresh = not wave
            if fresh:
                try:
                    wave.append(self._queue.get(timeout=0.05))
                except queue.Empty:
                    continue
                # Dynamic-batching grace (see __init__.batch_window).
                deadline = _time.monotonic() + self.batch_window
                while len(wave) < self.max_wave:
                    left = deadline - _time.monotonic()
                    if left <= 0:
                        break
                    try:
                        wave.append(self._queue.get(timeout=left))
                    except queue.Empty:
                        break
            while len(wave) < self.max_wave:
                try:
                    wave.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            carry = self._run_wave(wave)

    def _run_wave(self, wave: List[_Pending]) -> List[_Pending]:
        """Run one engine call over ``wave``; requests arriving MID-WAVE
        join it through the engine's ``admit`` hook (cross-request
        continuous batching) when the call's compiled machinery can serve
        them (``Engine.admissible``); the rest are returned deferred, to
        lead the next wave."""
        self.stats["waves"] += 1
        # Scoring-only requests (echo + max_tokens=0) skip generation; the
        # on_token request indices refer to the FILTERED list the engine
        # sees, so streams must be keyed on gen_wave positions.
        gen_wave = [p for p in wave if p.params.max_new_tokens != 0]
        streams = {
            i: p.stream_q
            for i, p in enumerate(gen_wave)
            if p.stream_q is not None
        }

        def on_token(req_idx: int, tok: int):
            q = streams.get(req_idx)
            if q is not None:
                if gen_wave[req_idx].cancelled:
                    # The SSE handler returned on disconnect and nothing
                    # will ever drain this queue — stop feeding it and drop
                    # the buffered tokens instead of holding dead memory
                    # until the cancel lands in the engine.
                    streams.pop(req_idx, None)
                    gen_wave[req_idx].stream_q = None
                    return
                q.put(tok)

        def cancel(req_idx: int) -> bool:
            """Engine request indices match gen_wave positions (admitted
            requests are appended to both in the same order)."""
            if 0 <= req_idx < len(gen_wave) and gen_wave[req_idx].cancelled:
                return True
            return False

        deferred: List[_Pending] = []

        def admit(features):
            """Drain the HTTP queue into the RUNNING engine call.  Only
            requests the call can serve join (Engine.admissible);
            incompatible or scoring-only ones defer to the next wave."""
            admitted = []
            while len(gen_wave) < self.max_wave:
                try:
                    p = self._queue.get_nowait()
                except queue.Empty:
                    break
                if p.params.max_new_tokens == 0 or not Engine.admissible(
                    features, p.tokens, p.params,
                    logprobs=p.logprobs, adapter=p.adapter,
                ):
                    deferred.append(p)
                    continue
                idx = len(gen_wave)
                gen_wave.append(p)
                wave.append(p)
                if p.stream_q is not None:
                    streams[idx] = p.stream_q
                admitted.append((p.tokens, p.params, p.adapter))
                self.stats["admitted"] += 1
            return admitted

        # Engine chunk loops poll this between pipelined chunks: break
        # out to refill as soon as a request is WAITING and a slot is
        # idle, instead of riding out a long run (see Engine.generate's
        # admit docs).  queue.empty() is approximate but cheap — a false
        # negative only delays admission by one chunk.
        admit.peek = lambda: not self._queue.empty()

        try:
            from .engine import GenerationResult

            for p in wave:
                if p not in gen_wave:
                    p.result = GenerationResult(list(p.tokens), [], True, [])
            if gen_wave:
                adapter = (
                    [p.adapter for p in gen_wave]
                    if any(p.adapter is not None for p in gen_wave)
                    else None
                )
                results = self.engine.generate(
                    [p.tokens for p in gen_wave],
                    adapter=adapter,
                    # Per-request budgets ride SamplingParams
                    # .max_new_tokens; the call-level value is a fallback.
                    max_new_tokens=max(
                        p.params.max_new_tokens or 64 for p in gen_wave
                    ),
                    sampling=[p.params for p in gen_wave],
                    return_logprobs=any(p.logprobs for p in gen_wave),
                    # Always wired: a request admitted mid-wave may stream
                    # even when none of the initial ones do.
                    on_token=on_token,
                    admit=admit,
                    cancel=cancel,
                )
            else:
                results = []
            # Prompt logprobs for echo+logprobs requests, one batched
            # teacher-forced pass (engine.score).
            need = [p for p in wave if p.echo and p.logprobs]
            if need:
                plps = self.engine.score(
                    [p.tokens for p in need],
                    adapter=(
                        [p.adapter for p in need]
                        if any(p.adapter is not None for p in need)
                        else None
                    ),
                )
                for p, lp in zip(need, plps):
                    p.prompt_logprobs = lp
        except Exception as e:  # surface engine failures to every waiter
            for p in wave:
                p.error = f"{type(e).__name__}: {e}"
                if p.stream_q is not None:
                    p.stream_q.put(None)
                p.done.set()
            return deferred
        for p, r in zip(gen_wave, results):
            p.result = r
            self.stats["tokens_out"] += len(r.tokens)
            # A socket can close AFTER its request finished normally; only
            # an unfinished result was actually cut short by the cancel.
            if p.cancelled and not r.finished:
                self.stats["cancelled"] += 1
        for p in wave:
            if p.stream_q is not None:
                p.stream_q.put(None)
            p.done.set()
        return deferred

    # -- request entry ------------------------------------------------------

    def submit(
        self,
        body: Dict[str, Any],
        seed_offset: int = 0,
        tokens: Optional[List[int]] = None,
    ) -> _Pending:
        if tokens is None:
            prompt = body.get("prompt")
            if isinstance(prompt, str):
                if self.tokenizer is None:
                    raise ValueError(
                        "string prompt but the server has no tokenizer; "
                        "send token ids"
                    )
                tokens = list(self.tokenizer.encode(prompt))
            elif isinstance(prompt, (list, tuple)) and all(
                isinstance(t, int) for t in prompt
            ):
                tokens = list(prompt)
            else:
                raise ValueError(
                    "prompt must be a string or a list of token ids"
                )
        model = body.get("model")
        adapter_idx = None
        # Without an adapter map, the model field is informational (the
        # pre-multi-LoRA behavior — OpenAI SDKs always send one); with a
        # map, it routes and unknown names are a client error.
        if model is not None and model != self.model_name and self.adapters:
            if model not in self.adapters:
                raise ValueError(
                    f"unknown model {model!r}; served models: "
                    f"{[self.model_name, *self.adapters]}"
                )
            adapter_idx = self.adapters[model]
        echo = bool(body.get("echo", False))
        params = _params_from_body(body, seed_offset)
        if not 0 <= params.top_logprobs <= 20:
            # OpenAI caps alternatives (5 classic / 20 chat); an unbounded
            # k would crash top_k inside the wave and fail co-batched
            # requests.
            raise ValueError("logprobs/top_logprobs must be in [0, 20]")
        if echo and len(tokens) > self.engine.cfg.max_seq_len:
            raise ValueError(
                f"prompt length {len(tokens)} exceeds the model context "
                f"{self.engine.cfg.max_seq_len}"
            )
        gc = body.get("guided_choice")
        if gc:
            # vLLM-style guided choice: each option is a token-id list, or
            # a string when the server has a tokenizer.
            opts = []
            for c in gc:
                if isinstance(c, str):
                    if self.tokenizer is None:
                        raise ValueError(
                            "string guided_choice needs a tokenizer; "
                            "send token-id lists"
                        )
                    opts.append(tuple(self.tokenizer.encode(c)))
                else:
                    opts.append(tuple(int(t) for t in c))
            import dataclasses as _dc

            params = _dc.replace(params, choices=tuple(opts))
        if params.max_new_tokens == 0 and not echo:
            raise ValueError("max_tokens=0 requires echo=true (scoring)")
        pending = _Pending(
            tokens=tokens,
            params=params,
            logprobs=bool(body.get("logprobs", False))
            or int(body.get("top_logprobs", 0) or 0) > 0,
            stream_q=queue.Queue() if body.get("stream") else None,
            adapter=adapter_idx,
            echo=echo,
        )
        self.stats["requests"] += 1
        self._queue.put(pending)
        return pending

    def submit_n(
        self, body: Dict[str, Any], tokens: Optional[List[int]] = None
    ) -> List[_Pending]:
        """Submit ``n`` independent completions of one prompt (they batch
        into the same wave; with a seed, choice i uses seed+i)."""
        n = int(body.get("n", 1))
        if n < 1:
            raise ValueError("n must be >= 1")
        if n > 1 and body.get("stream"):
            raise ValueError("streaming is single-choice; use n=1")
        return [
            self.submit(body, seed_offset=i, tokens=tokens) for i in range(n)
        ]

    def chat_tokens(self, body: Dict[str, Any]) -> List[int]:
        """Render ``messages`` to prompt token ids.

        Uses the tokenizer's own chat template when it has one (the HF
        contract: ``apply_chat_template(messages, tokenize=True,
        add_generation_prompt=True) -> ids``); otherwise a minimal
        ChatML-ish fallback so any encode/decode tokenizer still serves
        chat traffic.
        """
        messages = body.get("messages")
        if not isinstance(messages, list) or not messages:
            raise ValueError("messages must be a non-empty list")
        for m in messages:
            if not isinstance(m, dict) or "role" not in m or "content" not in m:
                raise ValueError("each message needs role and content")
        if self.tokenizer is None:
            raise ValueError("chat completions need a tokenizer")
        if hasattr(self.tokenizer, "apply_chat_template"):
            return list(
                self.tokenizer.apply_chat_template(
                    messages, tokenize=True, add_generation_prompt=True
                )
            )
        text = "".join(
            f"<|{m['role']}|>\n{m['content']}\n" for m in messages
        ) + "<|assistant|>\n"
        return list(self.tokenizer.encode(text))

    def _decode_text(self, ids: Sequence[int]) -> Optional[str]:
        if self.tokenizer is None:
            return None
        return self.tokenizer.decode(list(ids))

    def _token_key(self, t: int) -> str:
        """Dict key for one token in top_logprobs rows: its decoded text,
        or the stringified id without a tokenizer."""
        txt = self._decode_text([t])
        return txt if txt is not None else str(t)

    def _choice(self, p: _Pending, index: int) -> Dict[str, Any]:
        r = p.result
        out_tokens = (list(p.tokens) if p.echo else []) + list(r.tokens)
        if r.finished:
            finish = "stop"
        elif p.cancelled:
            finish = "abort"  # cut short by client disconnect (vLLM's name)
        else:
            finish = "length"
        choice: Dict[str, Any] = {
            "index": index,
            "tokens": out_tokens,
            "finish_reason": finish,
        }
        text = self._decode_text(out_tokens)
        if text is not None:
            choice["text"] = text
        if p.echo and p.logprobs:
            # OpenAI echo scoring: the first prompt token has no
            # conditional probability (null), then the prompt's
            # teacher-forced logprobs, then the completion's.
            lp_block: Dict[str, Any] = {
                "token_logprobs": [None]
                + list(p.prompt_logprobs or [])
                + list(r.logprobs or [])
            }
            if r.top_logprobs is not None:
                # Alternatives are computed for GENERATED positions only;
                # prompt positions carry null placeholders.
                lp_block["top_logprobs"] = [None] * len(p.tokens) + [
                    {self._token_key(t): v for t, v in row}
                    for row in r.top_logprobs
                ]
            choice["logprobs"] = lp_block
            return choice
        if r.logprobs is not None and p.logprobs:
            lp_block: Dict[str, Any] = {"token_logprobs": list(r.logprobs)}
            if r.top_logprobs is not None:
                # OpenAI shape: one {token: logprob} dict per position.
                lp_block["top_logprobs"] = [
                    {self._token_key(t): v for t, v in row}
                    for row in r.top_logprobs
                ]
            choice["logprobs"] = lp_block
        return choice

    def completion_payload(
        self, pendings: Sequence[_Pending], chat: bool = False
    ) -> Dict[str, Any]:
        out = sum(len(p.result.tokens) for p in pendings)
        choices = [self._choice(p, i) for i, p in enumerate(pendings)]
        if chat:
            for c in choices:
                c["message"] = {
                    "role": "assistant",
                    "content": c.pop("text", None),
                }
        return {
            "object": "chat.completion" if chat else "text_completion",
            "model": self.model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": len(pendings[0].tokens),
                "completion_tokens": out,
                "total_tokens": len(pendings[0].tokens) + out,
            },
        }

    # -- lifecycle ----------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 8000) -> int:
        """Start the dispatcher and HTTP server (non-blocking); returns the
        bound port (pass ``port=0`` for an ephemeral one)."""
        self._dispatcher.start()
        server = self

        class Handler(BaseHTTPRequestHandler):
            # Quiet request logging (the engine is the interesting part).
            def log_message(self, *args):
                pass

            def _json(self, code: int, payload: Dict[str, Any]):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok", **server.stats})
                elif self.path == "/metrics":
                    # Prometheus text exposition (stdlib-only, scrapable).
                    eng = server.engine
                    lines = [
                        "# TYPE nf4tpu_requests_total counter",
                        f"nf4tpu_requests_total {server.stats['requests']}",
                        "# TYPE nf4tpu_waves_total counter",
                        f"nf4tpu_waves_total {server.stats['waves']}",
                        "# TYPE nf4tpu_tokens_out_total counter",
                        f"nf4tpu_tokens_out_total {server.stats['tokens_out']}",
                        "# TYPE nf4tpu_admitted_total counter",
                        f"nf4tpu_admitted_total {server.stats['admitted']}",
                        "# TYPE nf4tpu_cancelled_total counter",
                        f"nf4tpu_cancelled_total {server.stats['cancelled']}",
                        "# TYPE nf4tpu_spec_steps_total counter",
                        f"nf4tpu_spec_steps_total {eng.spec_stats['steps']}",
                        "# TYPE nf4tpu_spec_emitted_total counter",
                        f"nf4tpu_spec_emitted_total {eng.spec_stats['emitted']}",
                        "# TYPE nf4tpu_prefix_tokens_saved_total counter",
                        "nf4tpu_prefix_tokens_saved_total "
                        f"{eng.prefix_stats.get('tokens_saved', 0)}",
                        "# TYPE nf4tpu_batch_slots gauge",
                        f"nf4tpu_batch_slots {eng.batch_size}",
                    ]
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/v1/models":
                    self._json(
                        200,
                        {
                            "object": "list",
                            "data": [
                                {"id": name, "object": "model"}
                                for name in (
                                    server.model_name,
                                    *server.adapters,
                                )
                            ],
                        },
                    )
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                chat = self.path == "/v1/chat/completions"
                if self.path != "/v1/completions" and not chat:
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    tokens = server.chat_tokens(body) if chat else None
                    pendings = server.submit_n(body, tokens=tokens)
                except (ValueError, json.JSONDecodeError) as e:
                    self._json(400, {"error": str(e)})
                    return
                pending = pendings[0]
                if pending.stream_q is None:
                    for p in pendings:
                        p.done.wait()
                    errs = [p.error for p in pendings if p.error is not None]
                    if errs:
                        self._json(500, {"error": errs[0]})
                    else:
                        self._json(
                            200, server.completion_payload(pendings, chat=chat)
                        )
                    return
                # SSE streaming: one data: line per emitted token.
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                while True:
                    tok = pending.stream_q.get()
                    if tok is None:
                        break
                    text = server._decode_text([int(tok)])
                    if chat:
                        chunk = {
                            "object": "chat.completion.chunk",
                            "choices": [
                                {
                                    "index": 0,
                                    "delta": {"content": text},
                                    "token": int(tok),
                                }
                            ],
                        }
                    else:
                        chunk = {"token": int(tok)}
                        if text is not None:
                            chunk["text"] = text
                    try:
                        self.wfile.write(
                            b"data: " + json.dumps(chunk).encode() + b"\n\n"
                        )
                        self.wfile.flush()
                    except OSError:
                        # Client went away mid-stream: flag the request so
                        # the dispatcher's cancel callback retires its slot
                        # (within one decode chunk) instead of decoding the
                        # rest of the budget for nobody.
                        pending.cancelled = True
                        return
                pending.done.wait()
                if pending.error is not None:
                    self.wfile.write(
                        b"data: "
                        + json.dumps({"error": pending.error}).encode()
                        + b"\n\n"
                    )
                self.wfile.write(b"data: [DONE]\n\n")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(
            target=self._httpd.serve_forever, name="nf4-http", daemon=True
        ).start()
        self.port = self._httpd.server_address[1]
        return self.port

    def stop(self):
        self._shutdown.set()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()


def serve_http(
    engine: Engine,
    tokenizer=None,
    host: str = "127.0.0.1",
    port: int = 8000,
    model_name: str = "nf4-tpu",
) -> CompletionServer:
    """Convenience constructor: build, start, and return the server."""
    server = CompletionServer(engine, tokenizer, model_name=model_name)
    server.start(host, port)
    return server
