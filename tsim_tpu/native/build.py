"""Lazy build + load of the native C++ kernels via ctypes.

No packaging dependencies (pybind11 is unavailable): the shared object is
compiled with g++ on first use and cached under ``_build/`` keyed by a hash
of the source, so repeat imports are instant and source edits rebuild.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


class NativeBuildError(RuntimeError):
    pass


def load_library(name: str) -> ctypes.CDLL:
    """Compile (if needed) and dlopen ``src/<name>.cpp``."""
    with _LOCK:
        lib = _CACHE.get(name)
        if lib is not None:
            return lib
        src = os.path.join(_SRC_DIR, f"{name}.cpp")
        flags = ["-O3", "-march=native", "-std=c++17", "-shared", "-fPIC"]
        with open(src, "rb") as fh:
            digest = hashlib.sha256(
                fh.read() + " ".join(flags).encode()
            ).hexdigest()[:16]
        os.makedirs(_BUILD_DIR, exist_ok=True)
        so_path = os.path.join(_BUILD_DIR, f"{name}-{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".tmp{os.getpid()}"
            cmd = ["g++", *flags, src, "-o", tmp]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except FileNotFoundError as e:
                raise NativeBuildError(f"g++ not available: {e}") from e
            except subprocess.CalledProcessError as e:
                raise NativeBuildError(
                    f"native build failed:\n{e.stderr}"
                ) from e
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        _CACHE[name] = lib
        return lib
