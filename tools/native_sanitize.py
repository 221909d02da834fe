#!/usr/bin/env python
"""Race/memory validation of the native runtime (SURVEY.md §5.2).

Builds ``native/src/sanitize_harness.cpp`` together with the library source
under ThreadSanitizer and AddressSanitizer+UBSan and runs it in a bare
process — outside Python, where ASan's ``__cxa_throw`` interceptor collides
with jaxlib's uninstrumented exceptions and TSan reports only XLA-internal
noise (see VALIDATION.md "Sanitizers").  The in-Python pytest suite can still
be run under TSan via ``CROWDMOD_NATIVE_SANITIZE=thread`` +
``LD_PRELOAD=libtsan.so`` (crowdmod_tpu/native/build.py).

    python tools/native_sanitize.py            # both sanitizers
    python tools/native_sanitize.py thread     # just TSan
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "crowdmod_tpu", "native", "src")

SANITIZERS = {
    "thread": ["-fsanitize=thread"],
    "address": ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"],
}


def run_one(name: str, flags: list[str], workdir: str) -> bool:
    exe = os.path.join(workdir, f"harness_{name}")
    build = [
        "g++", "-O1", "-g", "-std=c++17", "-pthread", *flags,
        os.path.join(SRC, "crowdmod_native.cpp"),
        os.path.join(SRC, "sanitize_harness.cpp"),
        "-o", exe,
    ]
    print(f"[{name}] {' '.join(build)}")
    subprocess.run(build, check=True)
    env = dict(os.environ)
    env.setdefault("TSAN_OPTIONS", "halt_on_error=1")
    env.setdefault("ASAN_OPTIONS", "detect_leaks=1")
    proc = subprocess.run([exe, workdir, "3"], env=env)
    ok = proc.returncode == 0
    print(f"[{name}] {'PASS' if ok else f'FAIL rc={proc.returncode}'}")
    return ok


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    names = argv or list(SANITIZERS)
    with tempfile.TemporaryDirectory() as workdir:
        results = [run_one(n, SANITIZERS[n], workdir) for n in names]
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
