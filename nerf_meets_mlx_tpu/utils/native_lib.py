"""Shared loader for the ctypes bindings of the native/ C++ libraries.

Builds the requested shared object on demand (`make -C native <target>` —
target-specific so one library's missing link dependency cannot block
another's build) and caches the loaded CDLL per library. Returns None on
any failure so every binding can fall back to its pure-Python path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Callable, Dict, Optional

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"

_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def load_native_lib(
    so_name: str, register: Callable[[ctypes.CDLL], None]
) -> Optional[ctypes.CDLL]:
    """Load native/build/<so_name>, building it first if needed.

    `register` sets argtypes/restypes; it runs once per process. A build or
    load failure is cached as None (no retry storms on hot paths)."""
    if so_name in _cache:
        return _cache[so_name]
    _cache[so_name] = None
    lib_path = NATIVE_DIR / "build" / so_name
    if not lib_path.exists() and (NATIVE_DIR / "Makefile").exists():
        try:
            subprocess.run(
                ["make", "-C", str(NATIVE_DIR), f"build/{so_name}"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not lib_path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
        register(lib)
    except (OSError, AttributeError):
        return None
    _cache[so_name] = lib
    return lib
