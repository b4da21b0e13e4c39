"""Locate (and if needed, build) the C++ runtime helper library.

The native components (native/safetensors.cc mmap reader,
native/tokenizer.cc BPE encoder — the counterparts of the reference's
Swift helpers/safetensors.swift and tokeniser2.swift) compile into one
libeffort_io.so. The .so is a build artifact, not committed; on first
use we attempt a `make` so a fresh checkout gets the native path instead
of silently running the Python fallbacks forever. Any failure (no
compiler, read-only tree) degrades to the fallback — and is STAMPED
(native/.build_failed) so later processes skip the doomed 2-minute make
instead of re-paying it. Concurrent first-use is serialized with an
flock so two processes can't race make on the same output; a .so that
exists but cannot be dlopen'd (torn by a crashed build) is removed and
stamped rather than left permanently wedging the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_CHECKED = False
_PATH: str | None = None


def _loadable(path: str) -> bool:
    try:
        ctypes.CDLL(path)
        return True
    except OSError:
        return False


def _stamp_failure(ndir: str, why: str) -> None:
    try:
        with open(os.path.join(ndir, ".build_failed"), "w") as f:
            f.write(why[-2000:])
    except OSError:
        pass


def native_lib_path() -> str | None:
    """Absolute path of libeffort_io.so, building it once if possible."""
    global _CHECKED, _PATH
    if _CHECKED:
        return _PATH
    _CHECKED = True
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ndir = os.path.join(pkg, "native")
    path = os.path.join(ndir, "libeffort_io.so")
    stamp = os.path.join(ndir, ".build_failed")
    if (not os.path.exists(path) and os.path.exists(
            os.path.join(ndir, "Makefile")) and not os.path.exists(stamp)):
        try:
            import fcntl
            with open(os.path.join(ndir, ".build_lock"), "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)   # serialize builders
                if not os.path.exists(path) and not os.path.exists(stamp):
                    r = subprocess.run(["make", "-C", ndir], timeout=120,
                                       capture_output=True, check=False)
                    if r.returncode != 0:
                        _stamp_failure(ndir, r.stderr.decode(
                            "utf-8", "replace"))
        except Exception as e:
            _stamp_failure(ndir, repr(e))
    if os.path.exists(path) and not _loadable(path):
        # torn artifact (crashed/raced build): remove it so the failure
        # is visible and retryable, and stamp why
        _stamp_failure(ndir, "built .so failed to dlopen; removed")
        try:
            os.remove(path)
        except OSError:
            pass
    _PATH = path if os.path.exists(path) else None
    return _PATH
