"""``crowdmod doctor`` — deployment environment self-check.

No reference counterpart (its scripts fail at first use when the
environment is wrong); on a TPU pod you want one command that verifies the
whole stack before a long training run burns a slot.  Checks, in order:

  1. JAX backend: visible devices, platform, default dtype behavior
  2. Compile smoke: one tiny jitted matmul executes on the backend
  3. Native runtime: g++ build (or fallback), bin/transpose parity probe
  4. Shipped configs: every ``configs/**/*.yml`` passes schema validation
  5. Checkpoint IO: orbax round-trip in a temp dir
  6. Virtual-mesh sharding: 8-way DP reduction + FSDP param sharding on a
     CPU mesh subprocess (the library's own make_mesh/shard_params)

Exit code 0 = all checks pass (warnings allowed), 1 = at least one failure.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

OK, WARN, FAIL = "ok", "warn", "FAIL"


def _result(name: str, status: str, detail: str, results: list) -> None:
    results.append((name, status, detail))
    pad = max(1, 28 - len(name))
    print(f"  {name}{' ' * pad}[{status}] {detail}", flush=True)


def check_backend(results):
    import jax

    try:
        devs = jax.devices()
        platform = jax.default_backend()
        detail = f"{platform}, {len(devs)} device(s): {devs[0].device_kind}"
        _result("jax backend", OK, detail, results)
    except Exception as e:  # noqa: BLE001 — report, don't crash the doctor
        _result("jax backend", FAIL, repr(e), results)


def check_compile(results, cache_dir: str | None = None):
    import jax
    import jax.numpy as jnp

    try:
        before = 0
        if cache_dir:
            from crowdmod_tpu.utils.compile_cache import entry_count

            before = entry_count(cache_dir)
        t0 = time.time()
        out = jax.jit(lambda a, b: (a @ b).sum())(
            jnp.ones((128, 128), jnp.bfloat16), jnp.ones((128, 128), jnp.bfloat16)
        )
        val = float(out)
        dt = time.time() - t0
        status = OK if val == 128.0 * 128 * 128 else FAIL
        detail = f"bf16 matmul in {dt:.1f}s"
        if cache_dir:
            new = entry_count(cache_dir) - before
            if new > 0:
                detail += f"; cache cold (+{new} entries persisted)"
            elif before > 0:
                # No new entries on a populated dir: served from disk.  The
                # one blind spot is a miss too cheap to persist (under
                # jax_persistent_cache_min_compile_time_secs) — accepted,
                # because any miss expensive enough to matter persists its
                # entry and correctly reports "cache cold" above.  A
                # time-based verdict was tried and reverted: on the
                # tunneled backend a genuine disk hit ranges 0.1 s-30 s+
                # with load, so wall time cannot separate the regimes
                # (the dt is already printed for the operator).
                detail += f"; cache warm ({before} entries)"
            else:
                detail += "; cache on (compile under persist threshold)"
        _result("compile smoke", status, detail, results)
    except Exception as e:  # noqa: BLE001
        _result("compile smoke", FAIL, repr(e), results)


def check_native(results):
    import numpy as np

    from crowdmod_tpu import native

    try:
        available = native.native_available()
        a = np.arange(2 * 3 * 4 * 5 * 6, dtype=np.float32).reshape(2, 3, 4, 5, 6)
        out = native.transpose_to_native(a)
        ref = np.transpose(a, (0, 4, 2, 3, 1))
        if not np.array_equal(out, ref):
            _result("native runtime", FAIL, "transpose parity mismatch", results)
        elif available:
            _result("native runtime", OK, "C++ library built, parity probe passes",
                    results)
        else:
            _result("native runtime", WARN,
                    "no toolchain — numpy fallbacks active (slower ETL)", results)
    except Exception as e:  # noqa: BLE001
        _result("native runtime", FAIL, repr(e), results)


def check_configs(results):
    import pathlib

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.config.loader import is_datafile_list
    from crowdmod_tpu.config.validate import validate_config

    repo = pathlib.Path(__file__).resolve().parents[2]
    bad = []
    n = 0
    for yml in sorted((repo / "configs").rglob("*.yml")):
        # Companion files, not dataset configs: datafile lists (classified by
        # content, not filename — see is_datafile_list) and the HTML viewer's
        # models list.
        if yml.name == "models_list.yml" or is_datafile_list(yml):
            continue
        n += 1
        # One unparseable config must report FAIL, not crash the doctor
        # before the remaining checks and the summary run.
        try:
            problems = validate_config(load_config(yml))
        except Exception as e:  # noqa: BLE001
            problems = [repr(e)]
        if problems:
            bad.append(f"{yml.name}: {problems[0]}")
    if not n:
        _result("shipped configs", WARN, "no configs/ directory found", results)
    elif bad:
        _result("shipped configs", FAIL, "; ".join(bad[:3]), results)
    else:
        _result("shipped configs", OK, f"{n} configs validate", results)


def check_checkpoint_io(results):
    import jax.numpy as jnp

    from crowdmod_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    try:
        with tempfile.TemporaryDirectory() as d:
            target = os.path.join(d, "doctor_probe")
            params = {"w": jnp.arange(4.0)}
            save_checkpoint(target, params, metadata={"probe": True})
            back, meta = load_checkpoint(target)
            ok = bool((back["w"] == params["w"]).all()) and meta.get("probe")
            _result("checkpoint io", OK if ok else FAIL,
                    "orbax save/restore round-trip", results)
    except Exception as e:  # noqa: BLE001
        _result("checkpoint io", FAIL, repr(e), results)


def check_virtual_mesh(results):
    """8-device DP sharding in a subprocess (own XLA_FLAGS), like CI."""
    import subprocess

    import crowdmod_tpu

    pkg_root = os.path.dirname(os.path.dirname(
        os.path.abspath(crowdmod_tpu.__file__)
    ))
    code = (
        "import os;"
        "os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')"
        "+' --xla_force_host_platform_device_count=8';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import numpy as np;"
        "from jax.sharding import NamedSharding, PartitionSpec as P;"
        "from crowdmod_tpu.parallel import make_mesh, shard_params;"
        "mesh=make_mesh();"
        "x=jax.device_put(np.ones((8,4)), NamedSharding(mesh, P('data')));"
        "s=jax.jit(lambda v: v.sum())(x);"
        "assert float(s)==32.0;"
        # FSDP: a 'param' sharded over the data axis, all-gathered at use.
        "p=shard_params({'w': np.ones((4,16))}, mesh, min_size=1, mode='fsdp');"
        "assert 'data' in p['w'].sharding.spec;"
        "y=jax.jit(lambda p,x: x @ p['w'])(p,x);"
        "assert y.shape==(8,16) and float(y.sum())==8*16*4;"
        "print('mesh ok')"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": pkg_root + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        if proc.returncode == 0 and "mesh ok" in proc.stdout:
            _result("virtual 8-mesh", OK,
                    "DP batch sharding + FSDP param sharding execute",
                    results)
        else:
            _result("virtual 8-mesh", FAIL,
                    (proc.stderr or proc.stdout).strip()[-120:], results)
    except Exception as e:  # noqa: BLE001
        _result("virtual 8-mesh", FAIL, repr(e), results)


def run(argv: list[str] | None = None) -> int:
    from crowdmod_tpu.cli import common_parser

    p = common_parser("Environment self-check for crowdmod deployments.")
    p.add_argument("--skip-mesh", action="store_true",
                   help="Skip the subprocess virtual-mesh check (fastest).")
    p.add_argument("--compile-cache", type=str, default="", metavar="DIR",
                   help="persistent XLA cache directory (default "
                        "$CROWDMOD_COMPILE_CACHE or "
                        "~/.cache/crowdmod_tpu/xla)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="run without the persistent XLA compilation cache")
    args = p.parse_args(argv)

    # Default-on persistent cache: the doctor's own compile smoke is the
    # first jit a fresh machine runs (~168 s cold on a tunneled v5e backend,
    # VERDICT round 3) — persist it so every later doctor/serve/train start
    # is warm, and report cold/warm so the operator can see the state.
    cache_dir = None
    if not args.no_compile_cache:
        from crowdmod_tpu.utils.compile_cache import (
            enable_compilation_cache, enable_default_cache,
        )

        if args.compile_cache:
            cache_dir = enable_compilation_cache(args.compile_cache)
        else:
            # Respect an already-configured cache (JAX_COMPILATION_CACHE_DIR
            # or an embedding app) instead of re-pointing it at ~/.cache.
            cache_dir = enable_default_cache()

    print("crowdmod doctor", flush=True)
    results: list = []
    check_backend(results)
    check_compile(results, cache_dir=cache_dir)
    check_native(results)
    check_configs(results)
    check_checkpoint_io(results)
    if not args.skip_mesh:
        check_virtual_mesh(results)

    failed = [r for r in results if r[1] == FAIL]
    warned = [r for r in results if r[1] == WARN]
    print(f"{len(results) - len(failed) - len(warned)} ok, "
          f"{len(warned)} warnings, {len(failed)} failures")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(run())
