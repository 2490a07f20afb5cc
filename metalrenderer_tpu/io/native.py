"""ctypes bindings for the native (C++) runtime components.

The reference's asset/runtime layer is native (stb_image, metal-cpp,
CoreAudio); ours is too where it matters: the OBJ parser (native/
objparser.cpp) handles 100k+-triangle assets ~30x faster than the pure-
Python fallback. The shared library builds on demand with g++ and caches
next to the sources; every entry point degrades gracefully to the Python
implementation if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        # Cache keyed by source hash: a binary is only ever loaded if it
        # was built from exactly the sources on disk (no committed blobs,
        # no mtime races).
        src = _NATIVE_DIR / "objparser.cpp"
        digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
        cache = _NATIVE_DIR / ".cache"
        cache.mkdir(exist_ok=True)
        lib_path = cache / f"libobjparser-{digest}.so"
        if not lib_path.exists():
            # Unique temp per process: concurrent builds must not
            # interleave writes into one file before the atomic rename.
            import os
            tmp = lib_path.with_suffix(f".so.tmp{os.getpid()}")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(src)],
                check=True, capture_output=True)
            tmp.replace(lib_path)
        lib = ctypes.CDLL(str(lib_path))
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_counts.restype = ctypes.c_long
        lib.obj_counts.argtypes = [ctypes.c_void_p]
        lib.obj_fill.restype = None
        lib.obj_fill.argtypes = [ctypes.c_void_p] + \
            [np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")] * 3
        lib.obj_free.restype = None
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def parse_obj_native(path):
    """OBJ -> (pos f32[N,3], uv f32[N,2], nrm f32[N,3]) via C++, or None."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.obj_parse(str(path).encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        n = lib.obj_counts(handle)
        pos = np.empty((n, 3), np.float32)
        uv = np.empty((n, 2), np.float32)
        nrm = np.empty((n, 3), np.float32)
        if n:
            lib.obj_fill(handle, pos, uv, nrm)
        return pos, uv, nrm
    finally:
        lib.obj_free(handle)
