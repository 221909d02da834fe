"""``crowdmod serve`` — HTTP inference server.

The reference has no serving layer (SURVEY.md §1: control flow ends at CLI
scripts).  This wraps :class:`crowdmod_tpu.serving.Predictor` behind a
threaded stdlib HTTP server with the production endpoints a deployment
expects:

  * ``POST /predict``  — JSON ``{"past": [[...]], "seed": optional int}`` →
    ``{"future": [[...]], "latency_ms": float}``.  Concurrent requests are
    coalesced into single TPU dispatches by the
    :class:`~crowdmod_tpu.serving.BatchingQueue`.
  * ``GET /healthz``   — 200 once warmup has compiled every batch bucket,
    503 before that (readiness probe).
  * ``GET /metrics``   — Prometheus text format: request/sample counters,
    latency sum, queue depth, dispatch/coalesce counters.

Stdlib-only by design: no framework dependency to pin, and the hot path is
the TPU dispatch, not HTTP parsing.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from crowdmod_tpu.cli import common_parser, setup_logging


class ServingApp:
    """Holds the predictor + batching queue + readiness state."""

    def __init__(self, predictor, *, max_delay_ms: float = 5.0):
        from crowdmod_tpu.serving import BatchingQueue

        self.predictor = predictor
        self.queue = BatchingQueue(predictor, max_delay_ms=max_delay_ms)
        self.ready = threading.Event()

    def warmup(self):
        self.predictor.warmup()
        self.ready.set()
        return self

    def close(self):
        self.queue.close()

    # ------------------------------------------------------------------
    def handle_predict(self, payload: dict) -> dict:
        past = np.asarray(payload["past"], np.float32)
        if past.ndim == 4:  # single sequence without batch dim
            past = past[None]
        expected = self.predictor._shape  # (P, F, H, W, C)
        p, _, h, w, c = expected
        if past.ndim != 5 or past.shape[1:] != (p, h, w, c):
            raise ValueError(
                f"past must be (N, {p}, {h}, {w}, {c}) for this model, "
                f"got {past.shape}"
            )
        key = None
        if payload.get("seed") is not None:
            import jax

            key = jax.random.PRNGKey(int(payload["seed"]))
        import time

        t0 = time.perf_counter()
        future = self.queue.predict(past, key)
        return {
            "future": np.asarray(future).tolist(),
            "latency_ms": 1e3 * (time.perf_counter() - t0),
        }

    def metrics_text(self) -> str:
        s = self.predictor.stats
        q = self.queue
        lines = [
            "# TYPE crowdmod_requests_total counter",
            f"crowdmod_requests_total {s.requests}",
            "# TYPE crowdmod_samples_total counter",
            f"crowdmod_samples_total {s.samples}",
            "# TYPE crowdmod_request_latency_seconds_sum counter",
            f"crowdmod_request_latency_seconds_sum {s.total_latency_s:.6f}",
            "# TYPE crowdmod_dispatches_total counter",
            f"crowdmod_dispatches_total {q.dispatches}",
            "# TYPE crowdmod_coalesced_requests_total counter",
            f"crowdmod_coalesced_requests_total {q.coalesced_requests}",
            "# TYPE crowdmod_queue_depth gauge",
            f"crowdmod_queue_depth {q.depth}",
            "# TYPE crowdmod_ready gauge",
            f"crowdmod_ready {int(self.ready.is_set())}",
        ]
        return "\n".join(lines) + "\n"


class _Handler(BaseHTTPRequestHandler):
    # Set by make_server.
    app: ServingApp = None  # type: ignore[assignment]

    def log_message(self, fmt, *args):  # route to logging, not stderr
        logging.debug("http: " + fmt, *args)

    def _send(self, code: int, body: str | bytes,
              content_type: str = "application/json"):
        data = body.encode() if isinstance(body, str) else body
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    # ------------------------------------------------------------------
    def do_GET(self):
        if self.path == "/healthz":
            if self.app.ready.is_set():
                self._send(200, '{"status": "ok"}')
            else:
                self._send(503, '{"status": "warming up"}')
        elif self.path == "/metrics":
            self._send(200, self.app.metrics_text(),
                       "text/plain; version=0.0.4")
        else:
            self._send(404, '{"error": "not found"}')

    def do_POST(self):
        if self.path != "/predict":
            self._send(404, '{"error": "not found"}')
            return
        if not self.app.ready.is_set():
            self._send(503, '{"error": "warming up"}')
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            result = self.app.handle_predict(payload)
            self._send(200, json.dumps(result))
        except (KeyError, ValueError, TypeError) as e:
            self._send(400, json.dumps({"error": str(e)}))
        except Exception as e:  # pragma: no cover
            logging.exception("predict failed")
            self._send(500, json.dumps({"error": str(e)}))


def make_server(app: ServingApp, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` picks a free one."""
    handler = type("BoundHandler", (_Handler,), {"app": app})
    return ThreadingHTTPServer((host, port), handler)


def run(argv=None) -> int:
    p = common_parser("Serve a trained model over HTTP.")
    p.add_argument("--epoch-tag", type=str, default="000")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-buckets", type=int, nargs="+", default=[1, 8, 64])
    p.add_argument("--max-delay-ms", type=float, default=5.0,
                   help="micro-batching window for request coalescing")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard request batches over all local devices")
    p.add_argument("--compile-cache", type=str, nargs="?", const="",
                   default=None, metavar="DIR",
                   help="persist compiled buckets to DIR (default "
                        "~/.cache/crowdmod_tpu/xla) so restarts warm up "
                        "in seconds instead of recompiling")
    args = p.parse_args(argv)
    setup_logging("logs/serve.log")

    if args.compile_cache is not None:
        from crowdmod_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache or None)

    from crowdmod_tpu.serving import load_predictor

    predictor = load_predictor(
        args.config_yml_file, args.arch,
        datafiles_yml=args.configList_yml_file,
        epoch_tag=args.epoch_tag,
        data_parallel=args.data_parallel,
        batch_buckets=tuple(args.batch_buckets),
        seed=args.seed,
    )
    app = ServingApp(predictor, max_delay_ms=args.max_delay_ms)
    server = make_server(app, args.host, args.port)
    logging.info("listening on %s:%d (warming up)", *server.server_address)
    # Serve /healthz 503 while buckets compile, then flip ready.
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    app.warmup()
    logging.info("ready: buckets %s compiled", predictor.batch_buckets)
    try:
        thread.join()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        app.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
