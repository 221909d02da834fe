#!/usr/bin/env python
"""Serving quickstart: train a small model, serve it over HTTP, query it.

Covers the production inference surface the reference lacks entirely
(SURVEY.md §1 — its control flow ends at CLI scripts):

  1. train a DDPM on the synthetic walker fixture,
  2. stand up the bucketed predictor behind the HTTP server
     (micro-batching queue, readiness probe, Prometheus metrics),
  3. fire concurrent requests and read back predictions + metrics.

    python examples/serving_quickstart.py        # runs anywhere (CPU or TPU)
"""

import json
import os
import sys
import threading
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crowdmod_tpu.cli.serve import ServingApp, make_server
from crowdmod_tpu.config import load_config
from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.data.windows import WindowDataset
from crowdmod_tpu.serving import Predictor
from crowdmod_tpu.train.checkpoint import checkpoint_name
from crowdmod_tpu.train.trainer import Trainer


def main():
    h, w = 8, 12
    cfg = load_config("4test/ATC.yml").updated({
        "DATA_FS": {"SAVE_DIR": "/tmp/serve_qs/ckpts",
                    "OUTPUT_DIR": "/tmp/serve_qs/out"},
        "DATASET": {"BATCH_SIZE": 16},
        "MACROPROPS": {"ROWS": h, "COLS": w},
        "MODEL": {"DDPM": {"TIMESTEPS": 50,
                           "UNET": {"BASE_CH": 16, "BASE_CH_MULT": [1, 2],
                                    "APPLY_ATTENTION": [False, False],
                                    "TRAIN": {"EPOCHS": 4}}}},
    })

    # 1. Train on the walker fixture and checkpoint.
    raw = synthetic_walkers(24, h, w, 16)
    ds = WindowDataset(jnp.asarray(raw), past_len=5, future_len=3, stride=8)
    trainer = Trainer(cfg, "DDPM-UNet", run_dir="/tmp/serve_qs/run")
    trainer.fit(ds)  # saves best checkpoint "000" into SAVE_DIR

    # 2. Serve it.  warmup() compiles each batch bucket before /healthz
    #    flips to ready; max_delay_ms is the micro-batching window.
    ckpt = os.path.join(
        cfg.DATA_FS.SAVE_DIR, checkpoint_name(cfg, "DDPM-UNet", "000")
    )
    predictor = Predictor(cfg, "DDPM-UNet", ckpt, batch_buckets=(1, 8))
    app = ServingApp(predictor, max_delay_ms=3.0).warmup()
    server = make_server(app, port=0)          # port=0 → pick a free port
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{host}:{port}"
    print(f"serving on {base}")

    # 3. Concurrent clients: these coalesce into shared TPU dispatches.
    past, _ = ds.gather(np.arange(4))
    results = [None] * 4

    def client(i):
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"past": np.asarray(past[i:i + 1]).tolist()}).encode(),
        )
        results[i] = json.loads(urllib.request.urlopen(req).read())

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for i, r in enumerate(results):
        fut = np.asarray(r["future"])
        print(f"request {i}: future {fut.shape}, "
              f"latency {r['latency_ms']:.0f} ms")

    with urllib.request.urlopen(f"{base}/metrics") as r:
        print("--- /metrics ---")
        print(r.read().decode())
    server.shutdown()
    app.close()


if __name__ == "__main__":
    main()
