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
