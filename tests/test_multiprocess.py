"""Multi-PROCESS (multi-host) execution tests (VERDICT round 3, item #3).

tests/test_parallel.py proves single-process SPMD math; these tests prove
the process topology a real pod runs: N OS processes joined by
``jax.distributed.initialize`` (CPU backend, Gloo collectives), per-process
file-sharded input assembled into globally-sharded batches, the jitted
DDPM-DiT train step over the global mesh, cross-process loss agreement, and
process-0 checkpoint commit + all-process restore — all via
``tools/dryrun_multihost.py``, which is also the pod-launch runbook's dryrun
(SCALING.md).

The reference has no distributed code at all (SURVEY.md §2.9).
"""

import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO_ROOT, "tools", "dryrun_multihost.py")


def _run(tmp_path, *extra, timeout=570):
    out = str(tmp_path / "dmh")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # workers set their own device count
    proc = subprocess.run(
        [sys.executable, TOOL, "--out", out, *extra],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO_ROOT,
    )
    report_path = os.path.join(out, "report.json")
    report = json.load(open(report_path)) if os.path.exists(report_path) else {}
    return proc, report


def test_two_process_topology(tmp_path):
    """2 processes x 2 local devices: global mesh forms, per-process data
    feeds a global batch, losses agree bit-wise across processes AND match
    a single-process run of the identical schedule; checkpoint commits once
    and restores everywhere."""
    proc, report = _run(tmp_path, "--nprocs", "2")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert report["ok"] is True
    assert report["same_across_processes"] is True
    assert report["matches_single_process_control"] is True
    assert len(report["losses"]) == report["steps"]


@pytest.mark.nightly
def test_four_process_fsdp_topology(tmp_path):
    """4 processes with FSDP-sharded params: the ZeRO-3 layout's all-gathers
    cross process boundaries (DCN path on a real pod) and checkpoint
    all-gather reconstructs full params before the process-0 commit."""
    proc, report = _run(tmp_path, "--nprocs", "4", "--fsdp")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert report["ok"] is True
    assert report["matches_single_process_control"] is True


@pytest.mark.nightly
def test_two_process_cli_train_multihost(tmp_path):
    """The pod runbook's EXACT command, end to end: 2 OS processes each
    running ``crowdmod train --multihost --data-parallel`` with the manual
    CROWDMOD_COORDINATOR/NUM_PROCESSES/PROCESS_ID launch recipe.  Covers
    the CLI-layer glue the library harness cannot: env-var coordinator
    pickup, the secondary ``.procN`` run-dir rewrite, process-0-only loss
    plot, and the train-exit barrier."""
    proc, report = _run(tmp_path, "--nprocs", "2", "--cli")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert report["ok"] is True
    smoke = report["cli_smoke"]
    assert smoke["ok"] is True
    assert smoke["no_partial_commits"] is True
    assert smoke["main_owns_run"] is True


@pytest.mark.nightly
def test_two_process_cli_generate_metrics_multihost(tmp_path):
    """VERDICT r4 item 5: the pod runbook covers EVALUATION too.  After the
    CLI training smoke, 2 OS processes run ``crowdmod generate-metrics
    --multihost --data-parallel`` against its checkpoint: the protocol
    batch shards over the global data axis, process 0 commits the
    CSV/manifest, the secondary's scratch artifacts agree exactly, and the
    CSVs match a single-process control at the same global mesh size.
    (Also regression-covers the round-5 process_allgather fix: reloading a
    multihost-trained checkpoint must not see (nprocs,)-stacked scalars.)"""
    # Four phases (library workers + control, CLI train smoke, metrics
    # control, N-proc metrics): ~11 min on this 1-CPU host.
    proc, report = _run(tmp_path, "--nprocs", "2", "--metrics", timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert report["ok"] is True
    smoke = report["metrics_smoke"]
    assert smoke["ok"] is True
    assert smoke["procs_agree"] is True
    assert smoke["matches_control"] is True
    assert smoke["metric_arrays"] >= 18


def test_initialize_partial_env_is_a_labeled_error(monkeypatch):
    """A manual launch that sets CROWDMOD_COORDINATOR but forgets the other
    two env vars must fail with the runbook hint, not a bare KeyError."""
    from crowdmod_tpu.parallel import multiprocess

    monkeypatch.setenv("CROWDMOD_COORDINATOR", "127.0.0.1:9999")
    monkeypatch.delenv("CROWDMOD_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("CROWDMOD_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="CROWDMOD_NUM_PROCESSES"):
        multiprocess.initialize()
