"""Native host-side batch engine (C++ via ctypes).

``lib()`` returns the loaded shared library, compiling
``batch_engine.cc`` with g++ on first use (cached beside the source in
``_build/``; rebuilt when the source changes). Returns None — and every
caller falls back to vectorized numpy — when no compiler is available or
``LAM_SLIDE_NO_NATIVE=1`` is set, so the TPU training path never *requires*
a host toolchain.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = [os.path.join(_HERE, "batch_engine.cc"), os.path.join(_HERE, "xtc.cc")]
_BUILD_DIR = os.path.join(_HERE, "_build")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64 = ctypes.c_int64
_f32p = ctypes.POINTER(ctypes.c_float)
_i64p = ctypes.POINTER(_i64)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32pp = ctypes.POINTER(_f32p)
_i64pp = ctypes.POINTER(_i64p)

_SIGNATURES = {
    "gather_pad_f32": [_f32pp, _i64p, _i64p, _i64, _i64, _i64, _i64, _f32p],
    "gather_pad_i64": [_i64pp, _i64p, _i64p, _i64, _i64, _i64, _i64p],
    "broadcast_pad_i64": [_i64pp, _i64p, _i64, _i64, _i64, _i64p],
    "rotate_batch_f32": [_f32p, _f32p, _f32p, _i64p, ctypes.c_float,
                         ctypes.c_float, _i64, _i64, _i64, _i64],
    "center_frame0_f32": [_f32p, _i64p, _i64, _i64, _i64, _i64],
    "mask_fill_u8": [_u8p, _i64p, _i64, _i64, _i64],
    "team_flip_i64": [_i64p, _u8p, _i64, _i64],
    # GROMACS XTC codec (xtc.cc)
    "xtc_decode_frame": None,  # configured below (non-void returns)
    "xtc_peek_natoms": None,
    "xtc_encode_frame": None,
}

_u8cp = ctypes.POINTER(ctypes.c_uint8)
_i32 = ctypes.c_int32
_i32p = ctypes.POINTER(_i32)
_f32 = ctypes.c_float

_RETURNING = {
    "xtc_decode_frame": (
        _i32, [_u8cp, _i64, _i64p, _i32p, ctypes.POINTER(_f32), _f32p, _f32p, _i64]
    ),
    "xtc_peek_natoms": (_i32, [_u8cp, _i64, _i64]),
    "xtc_encode_frame": (
        _i64, [_i32, _i32, _f32, _f32p, _f32p, _f32, _u8cp, _i64]
    ),
}


def _build() -> Optional[str]:
    h = hashlib.sha256()
    for src in _SOURCES:
        with open(src, "rb") as f:
            h.update(f.read())
    tag = h.hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"engine_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # Per-process tmp name: concurrent processes (e.g. a benchmark and the
    # test suite) may both build the same tag; each compiles to its own tmp
    # and the os.replace is atomic, so whichever finishes first wins and the
    # others overwrite with identical bytes.
    tmp_path = f"{so_path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", tmp_path, *_SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, so_path)
    except (OSError, subprocess.SubprocessError):
        return so_path if os.path.exists(so_path) else None
    finally:
        # A failed compile/timeout (or a lost os.replace race) leaves the
        # pid-named temp behind; nothing ever reuses it, so drop it here.
        try:
            os.remove(tmp_path)
        except OSError:
            pass
    return so_path


def lib() -> Optional[ctypes.CDLL]:
    """The loaded engine, or None when unavailable/disabled."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LAM_SLIDE_NO_NATIVE") == "1":
            return None
        so_path = _build()
        if so_path is None:
            return None
        cdll = ctypes.CDLL(so_path)
        for name, argtypes in _SIGNATURES.items():
            fn = getattr(cdll, name)
            if argtypes is None:
                restype, argtypes = _RETURNING[name]
                fn.restype = restype
            else:
                fn.restype = None
            fn.argtypes = argtypes
        _lib = cdll
    return _lib


def available() -> bool:
    return lib() is not None
