"""TPU-native serving: AOT model artifacts + dynamic-batching inference.

The reference has no serving story — its "inference" is the training
drivers' eval/test_run mode (``video_features_tf/main.py`` ``--test_run``,
``video_features_pytorch/train_i3d_smth.py`` eval loop).  Production
deployment needs more: a compiled artifact that runs without the model
code, and a request path that keeps the chip fed with large static-shape
batches.  This subsystem provides both, TPU-first:

  * **AOT artifacts** via ``jax.export`` (StableHLO): the forward pass —
    weights baked in as constants — is serialized to one portable blob.
    A serving host deserializes and calls it without flax, the model
    zoo, or checkpoint files.  The batch dimension is exported
    symbolically, so one artifact serves every bucket size; XLA compiles
    (and caches) per concrete shape at call time, exactly matching the
    bucketed batcher below.
  * **Dynamic batching**: requests coalesce into padded power-of-two
    buckets — static shapes are what the XLA compilation model requires,
    and large batches are what the MXU requires (PERF.md: batch 128 is
    this workload's throughput knee).  Each bucket is ONE compiled
    program, reused forever.
  * an optional **stdlib HTTP endpoint** (``serve_http``) for remote
    clients, and a ``cli serve`` command wiring a checkpoint to it.

Everything here is stdlib + jax; no server frameworks.
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "export_forward",
    "save_artifact",
    "load_artifact",
    "DynamicBatcher",
    "BatcherStats",
    "serve_http",
]


# ---------------------------------------------------------------------------
# AOT artifacts
# ---------------------------------------------------------------------------

_MAGIC = b"IVFAOT1\n"


def export_forward(
    model,
    variables,
    input_shape: Sequence[int],
    dtype=jnp.float32,
    batch_polymorphic: bool = True,
    static_batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
):
    """Export ``model.apply(variables, x, train=False)`` as a
    ``jax.export.Exported`` with the weights baked in.

    ``input_shape`` is the per-clip shape WITHOUT the batch dimension,
    e.g. ``(16, 224, 224, 3)``.  With ``batch_polymorphic`` the leading
    dimension is exported as the symbolic size ``b`` — the artifact then
    accepts any batch size and XLA compiles per concrete size at call
    time (once per bucket under the batcher); otherwise it is fixed at
    ``static_batch``.  ``platforms`` defaults to the exporting machine's
    platform; pass ``("tpu", "cpu")`` for an artifact that also
    smoke-tests on CPU hosts.
    """
    from jax import export as jexport

    def fwd(x):
        return model.apply(variables, x, train=False)

    if batch_polymorphic:
        (b,) = jexport.symbolic_shape("b")
        lead = b
    else:
        lead = int(static_batch)
    spec = jax.ShapeDtypeStruct((lead, *input_shape), dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(fwd), **kwargs)(spec)


def save_artifact(exported, path: str, meta: Optional[dict] = None) -> None:
    """Write an exported forward as a single self-describing file:
    magic + json metadata (length-prefixed) + the serialized StableHLO."""
    blob = exported.serialize()
    meta = dict(meta or {})
    meta.setdefault("platforms", list(exported.platforms))
    meta.setdefault("in_avals", [str(a) for a in exported.in_avals])
    mj = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(mj).to_bytes(8, "little"))
        f.write(mj)
        f.write(blob)


def load_artifact(path: str):
    """Load a ``save_artifact`` file -> ``(call_fn, meta)``.

    ``call_fn(batch)`` runs the baked-in forward; no model code needed.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an ivf_tpu AOT artifact")
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        exported = jexport.deserialize(f.read())
    return exported.call, meta


# ---------------------------------------------------------------------------
# Dynamic batcher
# ---------------------------------------------------------------------------


@dataclass
class BatcherStats:
    requests: int = 0
    batches: int = 0
    padded_rows: int = 0
    rows: int = 0
    # bounded: long-running servers must not grow host memory per request
    latencies_ms: deque = field(default_factory=lambda: deque(maxlen=10_000))
    # guards latencies_ms: /stats handlers sort while the worker appends,
    # and deques raise "mutated during iteration" on concurrent append
    _lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, compare=False
    )

    def record(self, latency_ms: float) -> None:
        with self._lock:
            self.latencies_ms.append(latency_ms)

    def occupancy(self) -> float:
        return self.rows / max(1, self.rows + self.padded_rows)

    def summary(self) -> dict:
        with self._lock:
            lat = sorted(self.latencies_ms)

        def pct(p):
            return lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0

        return {
            "requests": self.requests,
            "batches": self.batches,
            "occupancy": round(self.occupancy(), 4),
            "latency_ms_p50": round(pct(0.50), 2),
            "latency_ms_p95": round(pct(0.95), 2),
        }


def _safe_set(fut: Future, result=None, exc: Optional[BaseException] = None):
    """Resolve a future exactly once — shutdown races mean the worker and
    close()/submit() can both try; the loser must be a no-op, not a crash."""
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:  # InvalidStateError: already resolved elsewhere
        pass


class DynamicBatcher:
    """Coalesce single-clip requests into bucketed device batches.

    ``infer_fn(batch) -> outputs`` must accept a leading batch dimension
    (a live jitted forward or a ``load_artifact`` call_fn).  Requests are
    drained up to ``max_batch`` or until ``max_wait_ms`` passes with a
    non-empty queue, padded to the smallest bucket (powers of two by
    default — one compiled program per bucket), and run as one call.

    Use as a context manager, or call ``close()``; ``submit`` returns a
    ``concurrent.futures.Future`` resolving to the clip's output row.
    """

    def __init__(
        self,
        infer_fn: Callable,
        max_batch: int = 128,
        max_wait_ms: float = 5.0,
        buckets: Optional[Sequence[int]] = None,
    ):
        if buckets is None:
            buckets = []
            b = 1
            while b < max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(max_batch)
        self.buckets = sorted(set(int(b) for b in buckets))
        assert self.buckets[-1] == max_batch, (self.buckets, max_batch)
        self.infer_fn = infer_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.stats = BatcherStats()
        self._q: Queue = Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- client side --------------------------------------------------
    def submit(self, clip: np.ndarray) -> Future:
        if self._closed:
            raise RuntimeError("batcher is closed")
        fut: Future = Future()
        self._q.put((np.asarray(clip), fut, time.monotonic()))
        if self._closed:
            # raced with close(): the worker may already have drained past
            # this item — make sure the future resolves either way
            _safe_set(fut, exc=RuntimeError("batcher is closed"))
        return fut

    def warmup(self, clip_shape: Sequence[int], dtype=np.float32) -> None:
        """Pre-compile every bucket program (first-request latency)."""
        for b in self.buckets:
            x = np.zeros((b, *clip_shape), dtype)
            jax.block_until_ready(self.infer_fn(x))

    def close(self) -> None:
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=30)
        # anything enqueued during the join window: fail, don't hang
        while True:
            try:
                item = self._q.get_nowait()
            except Empty:
                break
            if item is not None:
                _safe_set(item[1], exc=RuntimeError("batcher is closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker side --------------------------------------------------
    def _drain(self):
        """Block for one request, then greedily take up to max_batch,
        waiting at most max_wait_s for stragglers."""
        item = self._q.get()
        if item is None:
            return None
        batch = [item]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post the sentinel for the outer loop
                break
            batch.append(nxt)
        return batch

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _run(self):
        while True:
            batch = self._drain()
            if batch is None:
                # shutdown: fail anything that raced past the _closed check
                # into the queue behind the sentinel, so no future hangs
                while True:
                    try:
                        item = self._q.get_nowait()
                    except Empty:
                        break
                    if item is not None:
                        _safe_set(
                            item[1], exc=RuntimeError("batcher is closed")
                        )
                return
            n = len(batch)
            try:
                # stack/pad inside the try: a shape-mismatched request must
                # fail ITS batch's futures, not kill the worker thread
                clips = np.stack([c for c, _, _ in batch])
                b = self._bucket(n)
                if b > n:  # pad by repeating row 0 (cheapest valid rows)
                    clips = np.concatenate(
                        [clips, np.repeat(clips[:1], b - n, axis=0)]
                    )
                out = np.asarray(self.infer_fn(clips))[:n]
            except Exception as e:  # propagate to every waiter
                for _, fut, _ in batch:
                    _safe_set(fut, exc=e)
                continue
            now = time.monotonic()
            st = self.stats
            st.requests += n
            st.batches += 1
            st.rows += n
            st.padded_rows += b - n
            for j, (_, fut, t0) in enumerate(batch):
                st.record((now - t0) * 1e3)
                _safe_set(fut, result=out[j])


# ---------------------------------------------------------------------------
# HTTP endpoint (stdlib only)
# ---------------------------------------------------------------------------


def serve_http(batcher: DynamicBatcher, port: int = 0, host: str = "127.0.0.1"):
    """Start a threading HTTP server in the background; returns the server
    (``server.server_address`` has the bound port; ``server.shutdown()``
    stops it).

    * ``POST /predict`` — body is a ``.npy`` clip ``(T, H, W, C)``;
      response is JSON ``{"scores": [...], "top1": i}``.
    * ``GET  /stats``   — batcher stats summary.
    * ``GET  /healthz`` — liveness.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silent
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, batcher.stats.summary())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                clip = np.load(io.BytesIO(self.rfile.read(n)))
                scores = batcher.submit(clip).result(timeout=120)
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            self._json(
                200,
                {
                    "scores": np.asarray(scores, np.float64).tolist(),
                    "top1": int(np.argmax(scores)),
                },
            )

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
