"""On-demand compilation of the native host runtime (g++ -> shared lib).

The reference builds its host runtime with CMake/nvcc; here the C++ host
pieces compile lazily into a cached ``.so`` loaded via ctypes, so the pure
Python/JAX path keeps working on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

_SRC = Path(__file__).parent / "src" / "ggnn_native.cpp"
_lib = None
_tried = False


def _cache_dir() -> Path:
    d = os.environ.get("GGNN_TPU_CACHE", None)
    if d:
        return Path(d)
    return Path(tempfile.gettempdir()) / "ggnn_tpu_native"


def _build() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out_dir = _cache_dir()
    out_dir.mkdir(parents=True, exist_ok=True)
    so_path = out_dir / f"ggnn_native_{tag}.so"
    if so_path.exists():
        return so_path
    tmp = so_path.with_suffix(".so.tmp")
    cmd = [
        "g++",
        "-O3",
        "-std=c++20",
        "-shared",
        "-fPIC",
        "-pthread",
        str(_SRC),
        "-o",
        str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GGNN_TPU_NO_NATIVE"):
        return None
    so_path = _build()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None

    lib.ggnn_vecs_info.restype = ctypes.c_int64
    lib.ggnn_vecs_info.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ggnn_read_vecs.restype = ctypes.c_int64
    lib.ggnn_read_vecs.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.ggnn_write_vecs.restype = ctypes.c_int64
    lib.ggnn_write_vecs.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.ggnn_merge_topk.restype = None
    lib.ggnn_merge_topk.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib
