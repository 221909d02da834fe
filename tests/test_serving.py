"""Serving-layer tests: bucket padding, warmup compile caching, mesh path."""

import numpy as np
import pytest

import jax

from crowdmod_tpu.cli import train
from crowdmod_tpu.serving import Predictor, load_predictor


@pytest.fixture
def trained(workspace):
    ws = workspace
    rc = train.run([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--arch", "DDPM-UNet", "--run-dir", str(ws["tmp"] / "run"),
    ])
    assert rc == 0
    return ws


def test_predictor_buckets_and_stats(trained):
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"],
        batch_buckets=(2, 4),
    ).warmup()
    # One jitted sampler, one compilation per bucket shape.
    assert pred._sampler._cache_size() == 2

    past = np.random.default_rng(0).normal(size=(3, 5, 8, 12, 3)).astype(np.float32)
    out = pred.predict(past)
    assert out.shape == (3, 3, 8, 12, 3)  # padded to 4, sliced back to 3
    assert pred.stats.requests == 1 and pred.stats.samples == 3
    assert pred.mean_latency_ms > 0

    with pytest.raises(ValueError):
        pred.predict(np.zeros((5, 5, 8, 12, 3), np.float32))


def test_predictor_deterministic_under_key(trained):
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"], batch_buckets=(2,)
    )
    past = np.zeros((2, 5, 8, 12, 3), np.float32)
    key = jax.random.PRNGKey(42)
    a = pred.predict(past, key=key)
    b = pred.predict(past, key=key)
    np.testing.assert_array_equal(a, b)


def test_predictor_mesh_parallel(trained):
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"],
        data_parallel=True, batch_buckets=(8,),
    )
    past = np.zeros((8, 5, 8, 12, 3), np.float32)
    out = pred.predict(past)
    assert out.shape == (8, 3, 8, 12, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Micro-batching queue + HTTP server
# ---------------------------------------------------------------------------

class _FakePredictor:
    """Predictor stand-in: records dispatch batch sizes, echoes shapes."""

    batch_buckets = (2, 8)
    _shape = (5, 3, 4, 4, 3)  # (P, F, H, W, C)

    def __init__(self):
        from crowdmod_tpu.serving import PredictorStats

        self.dispatch_sizes = []
        self.stats = PredictorStats()
        self.ready_gate = None  # optional threading.Event to stall dispatch

    def _bucket(self, n):
        for b in self.batch_buckets:
            if n <= b:
                return b
        raise ValueError(f"batch {n} exceeds largest bucket")

    def predict(self, past, key=None):
        if self.ready_gate is not None:
            self.ready_gate.wait(5.0)
        self.dispatch_sizes.append(past.shape[0])
        self.stats.record(past.shape[0], 0.001)
        n, p = past.shape[:2]
        return np.zeros((n, p - 2) + past.shape[2:], np.float32)


def test_batching_queue_coalesces_concurrent_requests():
    import threading

    from crowdmod_tpu.serving import BatchingQueue

    pred = _FakePredictor()
    pred.ready_gate = threading.Event()
    q = BatchingQueue(pred, max_delay_ms=200.0)
    try:
        # Stall the dispatcher so all three requests are queued together,
        # then release: they must coalesce into ONE device dispatch.
        futs = [q.submit(np.zeros((2, 5, 4, 4, 3), np.float32))
                for _ in range(3)]
        pred.ready_gate.set()
        outs = [f.result(10.0) for f in futs]
        assert all(o.shape == (2, 3, 4, 4, 3) for o in outs)
        assert pred.dispatch_sizes == [6]
        assert q.dispatches == 1 and q.coalesced_requests == 3
    finally:
        q.close()


def test_batching_queue_keyed_requests_dispatch_solo():
    import jax

    from crowdmod_tpu.serving import BatchingQueue

    pred = _FakePredictor()
    q = BatchingQueue(pred, max_delay_ms=50.0)
    try:
        out = q.predict(np.zeros((1, 5, 4, 4, 3), np.float32),
                        key=jax.random.PRNGKey(0), timeout=10.0)
        assert out.shape == (1, 3, 4, 4, 3)
        assert pred.dispatch_sizes == [1]
        with pytest.raises(ValueError):
            q.submit(np.zeros((9, 5, 4, 4, 3), np.float32))  # > largest bucket
    finally:
        q.close()
    with pytest.raises(RuntimeError):
        q.submit(np.zeros((1, 5, 4, 4, 3), np.float32))  # closed


def test_http_server_endpoints():
    import json
    import threading
    import urllib.request

    from crowdmod_tpu.cli.serve import ServingApp, make_server

    pred = _FakePredictor()
    app = ServingApp(pred, max_delay_ms=1.0)
    server = make_server(app)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        # Not ready before warmup → 503 readiness probe.
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/healthz")
        assert exc.value.code == 503
        app.ready.set()  # fake warmup (no compile in the fake)
        with urllib.request.urlopen(f"{base}/healthz") as r:
            assert r.status == 200

        past = np.zeros((2, 5, 4, 4, 3), np.float32)
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"past": past.tolist(), "seed": 7}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert np.asarray(body["future"]).shape == (2, 3, 4, 4, 3)
        assert body["latency_ms"] >= 0

        with urllib.request.urlopen(f"{base}/metrics") as r:
            text = r.read().decode()
        assert "crowdmod_requests_total 1" in text
        assert "crowdmod_ready 1" in text

        # Malformed payload → 400, not a crash.
        bad = urllib.request.Request(f"{base}/predict", data=b'{"nope": 1}')
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400

        # Wrong geometry → 400 with the expected shape in the message.
        wrong = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps(
                {"past": np.zeros((2, 5, 9, 9, 3), np.float32).tolist()}
            ).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(wrong)
        assert exc.value.code == 400
        assert "must be (N, 5, 4, 4, 3)" in exc.value.read().decode()
    finally:
        server.shutdown()
        app.close()


def test_http_server_end_to_end(trained):
    """Real trained predictor behind the HTTP server."""
    import json
    import threading
    import urllib.request

    from crowdmod_tpu.cli.serve import ServingApp, make_server

    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"], batch_buckets=(2,)
    )
    app = ServingApp(pred, max_delay_ms=1.0).warmup()
    server = make_server(app)
    host, port = server.server_address
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        past = np.zeros((5, 8, 12, 3), np.float32)  # no batch dim → added
        req = urllib.request.Request(
            f"http://{host}:{port}/predict",
            data=json.dumps({"past": past.tolist(), "seed": 1}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        out = np.asarray(body["future"])
        assert out.shape == (1, 3, 8, 12, 3)
        assert np.isfinite(out).all()
    finally:
        server.shutdown()
        app.close()


def test_http_load_shedding_and_timeout():
    """Queue overload → 429; per-request deadline exceeded → 504."""
    import json
    import threading
    import urllib.request

    from crowdmod_tpu.cli.serve import ServingApp, make_server

    pred = _FakePredictor()
    pred.ready_gate = threading.Event()  # never set: dispatcher stalls
    app = ServingApp(pred, max_delay_ms=1.0, max_queue=1,
                     request_timeout_s=0.2)
    app.ready.set()
    server = make_server(app)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    threading.Thread(target=server.serve_forever, daemon=True).start()
    body = json.dumps(
        {"past": np.zeros((1, 5, 4, 4, 3), np.float32).tolist()}
    ).encode()
    try:
        # First request: dispatcher picks it up, stalls on the gate, and the
        # 0.2 s deadline fires → 504.
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                urllib.request.Request(f"{base}/predict", data=body))
        assert exc.value.code == 504

        # Fill the queue (cap 1) then overflow → 429 load shedding.
        filler = app.queue.submit(np.zeros((1, 5, 4, 4, 3), np.float32))
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                urllib.request.Request(f"{base}/predict", data=body))
        assert exc.value.code == 429
    finally:
        pred.ready_gate.set()
        server.shutdown()
        app.close()


def test_timed_out_request_frees_queue_slot():
    """A request that exceeds its deadline is cancelled: it leaves the
    queue (so shed load frees capacity) and is never dispatched."""
    import threading
    import time

    from crowdmod_tpu.serving import BatchingQueue

    pred = _FakePredictor()
    pred.ready_gate = threading.Event()  # stall the dispatcher on request 1
    q = BatchingQueue(pred, max_delay_ms=1.0, max_queue=2)
    try:
        # Keyed head request dispatches solo and stalls inside predict().
        head = q.submit(np.zeros((1, 5, 4, 4, 3), np.float32), key=0)
        deadline = time.time() + 5.0
        while q.depth > 0 and time.time() < deadline:
            time.sleep(0.01)  # wait for the dispatcher to pop it
        # Second request waits in the queue; it must time out AND vacate.
        with pytest.raises(TimeoutError):
            q.predict(np.zeros((1, 5, 4, 4, 3), np.float32), timeout=0.1)
        assert q.depth == 0, "timed-out request still occupies the queue"
        pred.ready_gate.set()
        head.result(5.0)
        time.sleep(0.2)  # let the dispatcher drain
        # Only the head request ever reached the device.
        assert pred.dispatch_sizes == [1]
    finally:
        pred.ready_gate.set()
        q.close()


def test_load_predictor_missing_checkpoint(workspace):
    """Missing checkpoint fails fast with the path and a hint, not a deep
    orbax traceback."""
    ws = workspace
    with pytest.raises(FileNotFoundError, match="train it first"):
        load_predictor(ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"])


def test_multi_model_routing():
    import json
    import threading
    import urllib.request

    from crowdmod_tpu.cli.serve import ServingApp, make_server

    class _Fake2(_FakePredictor):
        _shape = (4, 2, 6, 6, 3)  # different geometry
        arch = "DDPM-DiT"

    _FakePredictor.arch = "DDPM-UNet"
    a, b = _FakePredictor(), _Fake2()
    app = ServingApp({"unet": a, "dit": b}, max_delay_ms=1.0)
    app.ready.set()
    server = make_server(app)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"{base}/models") as r:
            info = json.loads(r.read())
        assert set(info) == {"unet", "dit"}
        assert info["unet"]["default"] and not info["dit"]["default"]
        assert info["dit"]["past_shape"] == [4, 6, 6, 3]

        # Route to the non-default model by name.
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({
                "model": "dit",
                "past": np.zeros((1, 4, 6, 6, 3), np.float32).tolist(),
            }).encode(),
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body["model"] == "dit"
        assert np.asarray(body["future"]).shape == (1, 2, 6, 6, 3)
        assert b.dispatch_sizes and not a.dispatch_sizes

        # Unknown model → 400; per-model metric labels present.
        badreq = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"model": "nope", "past": [[0.0]]}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(badreq)
        assert exc.value.code == 400
        with urllib.request.urlopen(f"{base}/metrics") as r:
            text = r.read().decode()
        assert 'crowdmod_requests_total{model="dit"} 1' in text
        assert 'crowdmod_requests_total{model="unet"} 0' in text
    finally:
        server.shutdown()
        app.close()


def test_compilation_cache_persists(tmp_path):
    """enable_compilation_cache writes reusable executables to disk."""
    import glob

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.utils.compile_cache import enable_compilation_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    d = enable_compilation_cache(str(tmp_path / "xla"))
    try:
        # Lower the persistence threshold so a CPU-fast test compile lands.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def f(x):
            for _ in range(6):
                x = jnp.tanh(x @ x.T) @ x
            return x

        f(jnp.ones((96, 96))).block_until_ready()
        assert glob.glob(d + "/*"), "no cache entries written"
    finally:
        # Point the suite back at the conftest cache (enable_… resets the
        # process-global cache object so the redirect actually takes).
        enable_compilation_cache(prev_dir) if prev_dir else jax.config.update(
            "jax_compilation_cache_dir", None)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min)


def test_parse_model_buckets():
    from crowdmod_tpu.cli.serve import parse_model_buckets

    out = parse_model_buckets(["DDPM-DiT=64,8,1", "convrnn=8"])
    assert out == {"ddpm-dit": (1, 8, 64), "convrnn": (8,)}
    assert parse_model_buckets([]) == {}
    with pytest.raises(ValueError, match="NAME=B1,B2"):
        parse_model_buckets(["nonsense"])
    with pytest.raises(ValueError, match="bad bucket list"):
        parse_model_buckets(["x=a,b"])


def test_predictor_mesh_rounds_buckets_to_data_axis(trained):
    """Buckets not divisible by the data axis are rounded up, so warmup and
    batch-1 requests work on an 8-device mesh instead of crashing in
    shard_batch."""
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"],
        data_parallel=True, batch_buckets=(1, 3, 8),
    )
    assert pred.batch_buckets == (8,)  # 1→8, 3→8, 8→8, deduped
    pred.warmup()
    out = pred.predict(np.zeros((1, 5, 8, 12, 3), np.float32))
    assert out.shape == (1, 3, 8, 12, 3)
    assert np.isfinite(out).all()
