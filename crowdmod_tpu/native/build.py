"""On-demand build of the native runtime library.

``libcrowdmod_native.so`` is compiled from ``src/crowdmod_native.cpp`` with
the system ``g++`` the first time it's needed, then cached next to the
source (or in ``CROWDMOD_NATIVE_CACHE``).  Rebuilds happen automatically when
the source is newer than the cached object.  No pip/pybind11 involved —
plain C ABI + ctypes.
"""

from __future__ import annotations

import logging
import os
import subprocess
import tempfile
from pathlib import Path

SRC = Path(__file__).parent / "src" / "crowdmod_native.cpp"
LIB_NAME = "libcrowdmod_native.so"


def _cache_dir() -> Path:
    env = os.environ.get("CROWDMOD_NATIVE_CACHE")
    if env:
        return Path(env)
    d = Path(__file__).parent / "_build"
    try:
        d.mkdir(exist_ok=True)
        probe = d / ".probe"
        probe.touch()
        probe.unlink()
        return d
    except OSError:
        return Path(tempfile.gettempdir()) / "crowdmod_native"


def build_library(force: bool = False) -> Path | None:
    """Compile (if stale) and return the shared-library path, or None when no
    toolchain is available."""
    out_dir = _cache_dir()
    out_dir.mkdir(parents=True, exist_ok=True)
    # Race-detection build (SURVEY.md §5.2 — the runtime is threaded):
    # CROWDMOD_NATIVE_SANITIZE=thread|address builds with the sanitizer so
    # the parity tests double as data-race / memory checks.  The sanitize
    # mode is part of the cache key (distinct filename): otherwise a fresh
    # plain .so would make sanitizer runs a silent no-op, and a cached
    # sanitized .so would poison later normal runs.
    san = os.environ.get("CROWDMOD_NATIVE_SANITIZE")
    if san not in ("thread", "address"):
        san = None
    lib = out_dir / (LIB_NAME if san is None
                     else LIB_NAME.replace(".so", f".{san}.so"))
    if lib.exists() and not force and lib.stat().st_mtime >= SRC.stat().st_mtime:
        return lib
    # Compile to a per-process temp and atomically rename into place:
    # concurrent builders (two processes sharing the cache dir, or two
    # threads racing the lru_cache miss) must never observe a half-written
    # .so — a corrupt library with a fresh mtime would poison the cache for
    # every future process.
    tmp = out_dir / f"{lib.name}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-march=native", "-funroll-loops",
        str(SRC), "-o", str(tmp),
    ]
    if san is not None:
        cmd = [a for a in cmd if a != "-O3"]
        cmd[1:1] = ["-O1", "-g", f"-fsanitize={san}"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except FileNotFoundError:
        logging.info("g++ not found; native runtime disabled")
        return None
    except subprocess.TimeoutExpired:
        logging.warning("native build timed out; falling back to numpy paths")
        tmp.unlink(missing_ok=True)
        return None
    except subprocess.CalledProcessError as e:
        # -march=native can fail on exotic hosts; retry generic.
        try:
            generic = [a for a in cmd if a not in ("-march=native",)]
            subprocess.run(generic, check=True, capture_output=True, timeout=120)
        except Exception:
            logging.warning(
                "native build failed:\n%s", e.stderr.decode(errors="replace")
            )
            tmp.unlink(missing_ok=True)
            return None
    os.replace(tmp, lib)
    return lib
