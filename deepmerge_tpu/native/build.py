"""On-demand build of the native extensions (g++, CPython C API).

``ensure_built()`` compiles each .cpp into the package directory once and
caches the result; consumers fall back to pure Python when the toolchain is
missing. No pybind11 in the image — the extensions use the raw C API.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()

_EXTENSIONS = {
    "_unionfind": "unionfind.cpp",
    "_rastercodec": "rastercodec.cpp",
}


def _so_path(name: str) -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, name + suffix)


def ensure_built(name: str) -> str | None:
    """Build extension ``name`` if needed; returns the .so path or None."""
    src = os.path.join(_HERE, _EXTENSIONS[name])
    out = _so_path(name)
    with _LOCK:
        if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
            return out
        include = sysconfig.get_paths()["include"]
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            f"-I{include}", src, "-o", out,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
        return out


def load(name: str):
    """Import a native extension, building it first. Returns None on failure."""
    if ensure_built(name) is None:
        return None
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    try:
        import importlib

        return importlib.import_module(name)
    except Exception:
        return None
