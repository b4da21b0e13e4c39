"""Locate (and if needed, build) the C++ runtime helper library.

The native components (native/safetensors.cc mmap reader,
native/tokenizer.cc BPE encoder — the counterparts of the reference's
Swift helpers/safetensors.swift and tokeniser2.swift) compile into one
libeffort_io.so. The .so is a build artifact, not committed; on first
use we attempt a quiet `make` so a fresh checkout gets the native path
instead of silently running the Python fallbacks forever. Any failure
(no compiler, read-only tree) degrades to the fallback.
"""

from __future__ import annotations

import os
import subprocess

_CHECKED = False
_PATH: str | None = None


def native_lib_path() -> str | None:
    """Absolute path of libeffort_io.so, building it once if possible."""
    global _CHECKED, _PATH
    if _CHECKED:
        return _PATH
    _CHECKED = True
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ndir = os.path.join(pkg, "native")
    path = os.path.join(ndir, "libeffort_io.so")
    if not os.path.exists(path) and os.path.exists(
            os.path.join(ndir, "Makefile")):
        try:
            subprocess.run(["make", "-C", ndir], timeout=120,
                           capture_output=True, check=False)
        except Exception:
            pass
    _PATH = path if os.path.exists(path) else None
    return _PATH
