"""Smoke-run every example script end-to-end (slow tier).

The examples are the library's advertised entry paths (README Quickstart);
this guards them against API drift the unit suite can't see.  Each runs as a
subprocess on the virtual CPU mesh (env inherited from conftest).
"""

import os
import subprocess
import sys

import pytest

# Example scripts train real (tiny) models end-to-end in subprocesses —
# minutes each on this host.  API drift they guard against is nightly-scale
# risk, not per-commit; the oracle tier (-m "slow and not nightly") covers
# the same surfaces through the in-process CLI/trainer tests.
pytestmark = pytest.mark.nightly

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(script: str) -> subprocess.CompletedProcess:
    # Force the CPU platform via jax.config, not the env var: the ambient
    # sitecustomize re-pins JAX_PLATFORMS at a real TPU tunnel after process
    # start, and a wedged tunnel would hang the example at backend init.
    # (Same bootstrap contract as conftest.py / __graft_entry__.)
    driver = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"runpy.run_path(sys.argv[1], run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", driver, os.path.join(EXAMPLES, script)],
        capture_output=True, text=True, timeout=1500,
        env=os.environ.copy(), cwd=REPO,
    )


def test_quickstart_example():
    res = _run("quickstart.py")
    assert res.returncode == 0, res.stderr[-2000:]
    # It must actually train, score all three samplers, and render the GIF.
    assert "final loss:" in res.stdout
    for sampler in ("ancestral", "ddim/10", "dpm-solver/15"):
        assert sampler in res.stdout, res.stdout[-2000:]
    gif = res.stdout.split("wrote ")[-1].strip()
    assert gif.endswith(".gif") and os.path.exists(gif)


def test_scaling_quickstart_example():
    res = _run("scaling_quickstart.py")
    assert res.returncode == 0, res.stderr[-2000:]


def test_serving_quickstart_example():
    res = _run("serving_quickstart.py")
    assert res.returncode == 0, res.stderr[-2000:]


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
