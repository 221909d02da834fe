#!/usr/bin/env python
"""Direct-path serving latency across samplers (PERF.md serving table).

Measures :class:`crowdmod_tpu.serving.Predictor` end-to-end request latency
(host→device, full reverse chain, device→host) per batch bucket, for each
requested sampler — so the quality-pinned serving default (DDIM-eta η=1.0,
25 steps, ``configs/serving/``) is benchmarked as the SAME configuration
the quality study validated (VERDICT round-3 item 2: speed and quality must
be one configuration, not two).

    python tools/bench_serving.py --samplers DDIM-eta:1.0:25 DPM-Solver DDPM
    python tools/bench_serving.py --quick   # CPU smoke

The reference has no serving layer (SURVEY.md §1); its closest path is one
ancestral chain per generate_samples.py invocation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--samplers", nargs="+",
                   default=["DDIM-eta:1.0:25", "DPM-Solver", "DDPM"])
    p.add_argument("--arch", default="DDPM-DiT")
    p.add_argument("--config-yml-file", default="ATC.yml")
    p.add_argument("--batches", type=int, nargs="+", default=[8, 64])
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--train-epochs", type=int, default=2)
    p.add_argument("--workdir", default="/tmp/bench_serving")
    p.add_argument("--quick", action="store_true",
                   help="CPU smoke: 4test config, 3 reps, batch 8 only")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    import jax

    if args.quick:
        # CPU smoke: the image's sitecustomize pre-imports jax against the
        # axon TPU tunnel, so the env var alone cannot switch platforms.
        jax.config.update("jax_platforms", "cpu")
        args.config_yml_file = "4test/ATC.yml"
        args.reps = 3
        args.batches = [8]

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.serving import Predictor
    from crowdmod_tpu.utils.sampler_spec import sampler_overrides
    from tools.soak_http import ensure_checkpoint

    os.makedirs(args.workdir, exist_ok=True)
    base = load_config(args.config_yml_file).updated({
        "DATA_FS": {"SAVE_DIR": os.path.join(args.workdir, "ckpts"),
                    "OUTPUT_DIR": os.path.join(args.workdir, "out")},
        "MODEL": {"DDPM": {
            "DIT": {"TRAIN": {"EPOCHS": args.train_epochs}},
            "UNET": {"TRAIN": {"EPOCHS": args.train_epochs}},
        }},
    })
    ckpt = ensure_checkpoint(base, args.arch, args.workdir, args.train_epochs)

    results = {"backend": jax.default_backend(), "arch": args.arch,
               "reps": args.reps, "samplers": {}}
    for spec in args.samplers:
        cfg = base.updated({"MODEL": {"DDPM": sampler_overrides(spec)}})
        predictor = Predictor(cfg, args.arch, ckpt,
                              batch_buckets=tuple(args.batches))
        t0 = time.time()
        predictor.warmup()
        warm_s = time.time() - t0
        p_len, _, h, w, c = predictor.input_spec
        per_bucket = {}
        for b in args.batches:
            past = np.zeros((b, p_len, h, w, c), np.float32)
            past[:, :, h // 2, ::4, 0] = 1.0
            lat = []
            for _ in range(args.reps):
                t1 = time.perf_counter()
                predictor.predict(past)
                lat.append(time.perf_counter() - t1)
            lat = np.asarray(lat)
            per_bucket[str(b)] = {
                "p50_ms": round(1e3 * float(np.median(lat)), 1),
                "p95_ms": round(
                    1e3 * float(np.percentile(lat, 95)), 1),
                "samples_per_sec": round(b / float(np.median(lat)), 1),
            }
            print(f"{spec} @batch {b}: p50 {per_bucket[str(b)]['p50_ms']} ms"
                  f" = {per_bucket[str(b)]['samples_per_sec']} samples/s",
                  flush=True)
        results["samplers"][spec] = {"warmup_s": round(warm_s, 1),
                                     "buckets": per_bucket}
        # Release this sampler's compiled executables before building the
        # next Predictor — keeping every per-sampler program alive inflates
        # host/device memory across a multi-sampler run.
        del predictor
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
