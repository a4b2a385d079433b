"""Filesystem + environment shims.

Parity surface: ``utils/os_utils.py`` (link/move/copy/remove_file) and
``utils/commons/single_thread_env.py`` (thread pinning for data workers).
"""

from __future__ import annotations

import os
import shutil
import subprocess


def link_file(from_file: str, to_file: str):
    try:
        if os.path.lexists(to_file):
            os.remove(to_file)
        os.link(from_file, to_file)
    except OSError:
        shutil.copyfile(from_file, to_file)


def move_file(from_file: str, to_file: str):
    shutil.move(from_file, to_file)


def copy_file(from_file: str, to_file: str):
    shutil.copyfile(from_file, to_file)


def remove_file(*fns: str):
    for fn in fns:
        if os.path.isdir(fn):
            shutil.rmtree(fn, ignore_errors=True)
        elif os.path.exists(fn):
            os.remove(fn)


def set_single_thread_env():
    """Pin BLAS/OMP pools in forked data workers (single_thread_env.py)."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")


def cpu_keyed_cache_dir(base: str = "/tmp/jax_compile_cache") -> str:
    """Namespace a persistent XLA compile-cache dir by this host's CPU
    feature set. The cache stores AOT-compiled CPU code; reusing one dir
    across unlike hosts triggers XLA's "machine feature mismatch ... could
    lead to SIGILL" warnings (and worst-case illegal instructions). Keying
    by the /proc/cpuinfo flags hash gives each CPU generation its own
    cache, like utils/audio/native.py does for the fastdsp .so."""
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.machine() + platform.processor()
    key = hashlib.sha1(feats.encode()).hexdigest()[:10]
    path = f"{base.rstrip('/')}-{key}"
    # NEVER adopt a legacy un-keyed cache: XLA's cache key does not include
    # CPU features, so a hit serves a foreign host's AOT blob verbatim
    # ("machine feature mismatch ... could lead to SIGILL"). A cold
    # recompile per host is the correct price.
    os.makedirs(path, exist_ok=True)
    return path
