"""REST action server: POST /act {image, instruction, unnorm_key?} -> {action}.

Counterpart of reference vla-scripts/deploy.py:66-145 (FastAPI + uvicorn +
json_numpy). None of those are in the TPU image, so the server is stdlib
`http.server` with a small numpy-JSON codec — zero extra dependencies, same
wire contract plus a base64 fast path:

  image: nested-list JSON (json_numpy style), or {"__b64__", "shape",
         "dtype"} raw-bytes base64 (much cheaper for camera frames)
  instruction: str
  unnorm_key: optional dataset key for de-normalization statistics

Also serves GET /healthz. The model path is the fully-jitted
OpenVLA.predict_action, so steady-state latency is the bench number.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


def decode_image(payload: Any) -> np.ndarray:
    if isinstance(payload, dict) and "__b64__" in payload:
        raw = base64.b64decode(payload["__b64__"])
        arr = np.frombuffer(raw, dtype=np.dtype(payload.get("dtype", "uint8")))
        return arr.reshape(payload["shape"]).copy()
    if isinstance(payload, str):
        # double-encoded fallback (reference deploy.py:93-100)
        return decode_image(json.loads(payload))
    arr = np.asarray(payload)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return arr


def encode_array(arr: np.ndarray) -> Any:
    return np.asarray(arr).tolist()


def draft_from_history(prev2: Optional[np.ndarray], prev1: np.ndarray, vocab_size: int,
                       step_thresh: int = 2, clamp: int = 8, n_bins: int = 256) -> np.ndarray:
    """Hybrid token-space draft from the last two ticks' action tokens:
    per-dim, extrapolate the last step (clamped to +-`clamp` bins) only where
    it was >= `step_thresh` bins — tracks moving dims without letting
    extrapolation amplify sensor noise on the static dims. Action token ids
    are affine in bin index (vocab_size - bin), so bin arithmetic is exact in
    token space. Measured best across motion regimes in bench.py's
    speculative section."""
    if prev2 is None:
        return prev1
    step = np.clip(prev1.astype(np.int64) - prev2, -clamp, clamp)
    step = np.where(np.abs(step) >= step_thresh, step, 0)
    # Clip only the dims we extrapolated: a static dim's draft must be prev1
    # VERBATIM even if it lies outside the action-token range (random-weight
    # models emit such tokens; any int is a legal draft).
    ex = np.clip(prev1 + step, vocab_size - n_bins, vocab_size - 1)
    return np.where(step != 0, ex, prev1).astype(np.int32)


# Horizon bound: each value is its own jitted program shape (7*H decode
# positions); requests beyond any sane control-chunk length are rejected
# rather than traced (eval harnesses use H<=8).
MAX_HORIZON = 32


def batch_buckets(max_batch: int) -> List[int]:
    """The padded batch sizes the server executes: powers of two up to
    max_batch, plus max_batch itself when it is not one. The SINGLE source
    of truth shared with compile_cache.warmup_predict — any bucket the
    worker can hit is warmed, so no live request stalls behind a 7B compile."""
    buckets, b = [1], 2
    while b < max_batch:
        buckets.append(b)
        b *= 2
    if max_batch > 1:
        buckets.append(max_batch)
    return buckets


class _Pending:
    """One queued request awaiting a batch slot."""

    __slots__ = ("image", "instruction", "unnorm_key", "event", "result", "error", "abandoned")

    def __init__(self, image, instruction, unnorm_key):
        self.image, self.instruction, self.unnorm_key = image, instruction, unnorm_key
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        # Set when the submitting thread gave up (request_timeout_s): the
        # worker drops abandoned entries instead of burning a TPU pass on
        # results nobody will read.
        self.abandoned = False


class VLAServer:
    """Wraps an OpenVLA model + params; `run()` blocks serving requests.

    With `max_batch > 1`, concurrent requests are MICRO-BATCHED: a worker
    thread drains the queue for up to `batch_window_ms` after the first
    request, groups compatible requests (same unnorm_key + image shape), pads
    each group to the next power-of-two bucket, and runs ONE batched
    predict_action pass — one 7-GB weight stream serves the whole batch
    (measured: B=8 lifts aggregate throughput ~2.4x over sequential). The
    reference server (deploy.py:120-123) is strictly one-request-at-a-time on
    a batch-1-only model.

    Requests carrying `draft_tokens` take the speculative path directly
    (latency-bound control loops; see predict_action_speculative) — jax
    dispatch is thread-safe, so this coexists with the batching worker.

    DEFAULT MODE (batch-1, `speculative_default=True`): requests WITHOUT a
    client draft still decode speculatively, drafting from the server-side
    token history for the same (instruction, unnorm_key) via
    `draft_from_history` (hybrid per-dim extrapolation) — a robot control
    loop repeats one instruction, so after the first tick every request has
    a warm draft with zero client changes. Greedy-equivalent by the margin
    gate (predict_action_speculative); worst case (cold/rejected draft) costs
    one extra 7-token verify chunk, ~+4 ms on the 7B. Auto-disabled when the
    KV cache is int8 (the one configuration where verify-vs-decode
    quantization can exceed the gate; see generate_speculative docstring)."""

    def __init__(self, model, params, default_unnorm_key: Optional[str] = None,
                 max_batch: int = 1, batch_window_ms: float = 6.0, request_timeout_s: float = 600.0,
                 speculative_default: bool = True, speculative_margin: float = 0.25):
        self.model = model
        self.params = params
        self.default_unnorm_key = default_unnorm_key
        self.max_batch = int(max_batch)
        self.batch_window_s = batch_window_ms / 1e3
        self.request_timeout_s = request_timeout_s
        # Top-1 logit margin a drafted position must clear to be accepted
        # (generate_speculative's near-tie guard). 0.25 keeps outputs
        # greedy-equivalent under bf16 tiling noise; 0.0 accepts any exact
        # argmax match — the measured-ceiling setting (bench.py closedloop).
        self.speculative_margin = float(speculative_margin)
        import jax.numpy as jnp

        self.speculative_default = (
            bool(speculative_default)
            and getattr(model, "cache_dtype", None) != jnp.int8
            # A parallel-objective model must decode through generate_parallel;
            # the sequential speculative path would emit teacher-forced tokens
            # the fine-tune never trained (guarded here, not just in deploy.py).
            and not getattr(model, "parallel_decode", False)
        )
        # per-(instruction, unnorm_key) last-two action token vectors
        # (prev2, prev1) for draft_from_history, LRU-bounded
        from collections import OrderedDict

        self._draft_cache: "OrderedDict[Any, tuple]" = OrderedDict()
        self._draft_lock = threading.Lock()
        # Ops counters, served at GET /stats (the reference has no serving
        # observability at all). Latencies are a bounded ring of recent calls.
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_errors = 0
        self._recent_ms: List[float] = []
        self._started = time.time()
        if self.max_batch > 1:
            self._queue: "queue.Queue[_Pending]" = queue.Queue()
            self._worker = threading.Thread(target=self._batch_worker, daemon=True)
            self._worker.start()

    def _record(self, dt_s: float, error: bool) -> None:
        with self._stats_lock:
            self._n_requests += 1
            self._n_errors += int(error)
            self._recent_ms.append(dt_s * 1e3)
            if len(self._recent_ms) > 512:
                del self._recent_ms[: len(self._recent_ms) - 512]

    def stats(self) -> Dict[str, Any]:
        import numpy as _np

        with self._stats_lock:
            recent = list(self._recent_ms)
            n, e = self._n_requests, self._n_errors
        payload: Dict[str, Any] = {
            "requests": n, "errors": e, "uptime_s": round(time.time() - self._started, 1),
            "max_batch": self.max_batch,
        }
        if recent:
            payload["latency_ms"] = {
                "p50": round(float(_np.percentile(recent, 50)), 1),
                "p90": round(float(_np.percentile(recent, 90)), 1),
                "p99": round(float(_np.percentile(recent, 99)), 1),
                "last": round(recent[-1], 1),
                "window": len(recent),
            }
        return payload

    def predict(self, request: Dict[str, Any]) -> Dict[str, Any]:
        image = decode_image(request["image"])
        instruction = request["instruction"]
        # Clients may send an explicit null (client_act always includes the
        # field), so `or` — not .get's default — resolves to the server key.
        unnorm_key = request.get("unnorm_key") or self.default_unnorm_key
        if request.get("horizon") is not None:
            # `is not None`, not truthiness: horizon=0 must reach the range
            # check below and 500, not silently fall through to the
            # single-action path with an unexpected shape.
            # Chunked control (OFT-style): one parallel forward emits the
            # current + horizon-1 future actions — ONLY meaningful for models
            # fine-tuned with `finetune.py --parallel_decode --action_chunk`.
            # Bypasses micro-batching and drafting (no decode loop to skip).
            horizon = int(request["horizon"])
            if not getattr(self.model, "parallel_decode", False):
                # Without the parallel-objective fine-tune, generate_parallel
                # emits untrained positions — garbage with a 200. Refuse.
                raise ValueError(
                    "horizon requires a parallel-objective model "
                    "(deploy.py --parallel_decode on a --parallel_decode fine-tune)")
            if not 1 <= horizon <= MAX_HORIZON:
                # Each horizon is its own jitted program shape; an unbounded
                # value lets one request pin the chip on a fresh trace.
                raise ValueError(f"horizon must be in [1, {MAX_HORIZON}], got {horizon}")
            chunk = self.model.predict_action_chunk(
                self.params, image, instruction, horizon=horizon,
                unnorm_key=unnorm_key,
            )
            return {"action": encode_array(chunk)}
        if (request.get("draft_tokens") is not None
                and not getattr(self.model, "parallel_decode", False)):
            # Speculative serving (stateless): the client sends back the
            # `tokens` from its previous response as the draft; smooth robot
            # trajectories get a mostly-accepted draft -> ~1.8x faster while
            # staying greedy-equivalent. Bypasses micro-batching (a control
            # loop is latency-, not throughput-, bound). On a parallel-
            # objective model the draft is IGNORED (falls through to the
            # parallel program below): the sequential speculative path would
            # emit teacher-forced tokens that fine-tune never trained.
            action, tokens = self.model.predict_action_speculative(
                self.params, image, instruction,
                draft_tokens=np.asarray(request["draft_tokens"], np.int32),
                unnorm_key=unnorm_key, margin_threshold=self.speculative_margin,
            )
            return {"action": encode_array(action), "tokens": encode_array(tokens)}
        if self.max_batch <= 1:
            if self.speculative_default:
                key = (instruction, unnorm_key)
                with self._draft_lock:
                    hist = self._draft_cache.get(key, (None, None))
                if hist[1] is None:
                    draft = np.zeros(self.model.get_action_dim(unnorm_key), np.int32)
                else:
                    draft = draft_from_history(hist[0], hist[1], self.model.cfg.llm.vocab_size,
                                               n_bins=getattr(self.model, "n_action_bins", 256))
                action, tokens = self.model.predict_action_speculative(
                    self.params, image, instruction, draft_tokens=draft, unnorm_key=unnorm_key,
                    margin_threshold=self.speculative_margin,
                )
                with self._draft_lock:
                    self._draft_cache[key] = (hist[1], np.asarray(tokens, np.int32))
                    self._draft_cache.move_to_end(key)
                    while len(self._draft_cache) > 64:
                        self._draft_cache.popitem(last=False)
                return {"action": encode_array(action), "tokens": encode_array(tokens)}
            action = self.model.predict_action(self.params, image, instruction, unnorm_key=unnorm_key)
            return {"action": encode_array(action)}
        pending = _Pending(image, instruction, unnorm_key)
        self._queue.put(pending)
        if not pending.event.wait(timeout=self.request_timeout_s):
            pending.abandoned = True
            raise TimeoutError("batched predict timed out")
        if pending.error is not None:
            raise pending.error
        return {"action": encode_array(pending.result)}

    # --- micro-batching worker -------------------------------------------

    def _batch_worker(self) -> None:
        while True:
            batch = [self._queue.get()]
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            live = [p for p in batch if not p.abandoned]
            for group in self._group_compatible(live):
                self._run_group(group)

    @staticmethod
    def _group_compatible(batch: List[_Pending]) -> List[List[_Pending]]:
        groups: Dict[Any, List[_Pending]] = {}
        for p in batch:
            groups.setdefault((p.unnorm_key, np.asarray(p.image).shape), []).append(p)
        return list(groups.values())

    def _run_group(self, group: List[_Pending]) -> None:
        try:
            group = [p for p in group if not p.abandoned]
            if not group:
                return
            n = len(group)
            # Pad to the next warmed bucket: a handful of compiled batch
            # sizes instead of one executable per arrival count, and only
            # sizes warmup_predict has already compiled (batch_buckets is
            # the shared list — a non-power-of-two max_batch is a bucket
            # too, so it never triggers a mid-serving compile stall).
            bucket = next(b for b in batch_buckets(self.max_batch) if b >= n)
            images = [p.image for p in group] + [group[0].image] * (bucket - n)
            instructions = [p.instruction for p in group] + [group[0].instruction] * (bucket - n)
            actions = self.model.predict_action_batch(
                self.params, images, instructions, unnorm_key=group[0].unnorm_key
            )
            for p, action in zip(group, actions[:n]):
                p.result = np.asarray(action)
                p.event.set()
        except BaseException as e:  # noqa: BLE001 — delivered per-request
            for p in group:
                p.error = e
                p.event.set()

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, code: int, payload: Dict[str, Any]) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._send(200, server_self.stats())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/act":
                    self._send(404, {"error": "not found"})
                    return
                t0 = time.perf_counter()
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    request = json.loads(self.rfile.read(length))
                    out = server_self.predict(request)
                except Exception:
                    # per-request error containment (reference deploy.py:110-118)
                    server_self._record(time.perf_counter() - t0, error=True)
                    traceback.print_exc()
                    try:
                        self._send(500, {"error": "error", "detail": traceback.format_exc(limit=3)})
                    except OSError:
                        pass  # client already gone
                    return
                # The prediction succeeded — record it exactly once, even if
                # the client hung up before the response write (a send failure
                # must not re-enter the except above and double-count).
                server_self._record(time.perf_counter() - t0, error=False)
                try:
                    self._send(200, out)
                except OSError:
                    pass  # client timed out/closed; the result is simply lost

        return Handler

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        print(f"[serve] listening on {host}:{port} (POST /act)")
        httpd.serve_forever()

    def serve_background(self, host: str = "127.0.0.1", port: int = 8000):
        import threading

        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd


def client_act(host: str, port: int, image: np.ndarray, instruction: str, unnorm_key: Optional[str] = None,
               use_b64: bool = True, draft_tokens: Optional[np.ndarray] = None, return_tokens: bool = False,
               horizon: Optional[int] = None):
    """Minimal client (counterpart of the reference's requests snippet in
    deploy.py's docstring; also used by the robot eval harnesses).

    Speculative control loops: pass `draft_tokens` (the `tokens` from the
    previous response) and set `return_tokens=True` to receive
    (action, tokens) — feed the tokens back on the next tick.
    Chunked control: pass `horizon=H` to receive an [H, action_dim] chunk
    (parallel-objective fine-tunes only)."""
    import http.client

    if use_b64:
        img_payload = {
            "__b64__": base64.b64encode(np.ascontiguousarray(image).tobytes()).decode("ascii"),
            "shape": list(image.shape),
            "dtype": str(image.dtype),
        }
    else:
        img_payload = image.tolist()
    payload = {"image": img_payload, "instruction": instruction, "unnorm_key": unnorm_key}
    if draft_tokens is not None:
        payload["draft_tokens"] = np.asarray(draft_tokens).tolist()
    if horizon is not None:
        payload["horizon"] = int(horizon)
    body = json.dumps(payload)
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/act", body=body, headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"server error: {data}")
    action = np.asarray(data["action"])
    if return_tokens:
        return action, (np.asarray(data["tokens"]) if "tokens" in data else None)
    return action
