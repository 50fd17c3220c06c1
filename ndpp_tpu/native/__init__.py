"""Native (C++) host components, loaded via ctypes with Python fallback.

The reference's runtime is entirely native Fortran (SURVEY.md section 2);
this package holds the TPU-framework's native host equivalents. Currently:

  ace_tokenizer  whitespace-float tokenization of ACE ASCII tables
                 (the host-parse hot path at library scale)

The shared library is built on demand with g++ (cached next to the
sources); set NDPP_TPU_NO_NATIVE=1 to force the numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libndpp_native.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    src = _HERE / "ace_tokenizer.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("NDPP_TPU_NO_NATIVE"):
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ndpp_tokenize.restype = ctypes.c_longlong
        lib.ndpp_tokenize.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.ndpp_count_tokens.restype = ctypes.c_longlong
        lib.ndpp_count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def tokenize_floats(text: str | bytes, expected: int | None = None) -> np.ndarray:
    """All whitespace-separated floats in `text` as float64 (native or numpy path)."""
    data = text.encode() if isinstance(text, str) else text
    lib = get_lib()
    if lib is not None:
        cap = expected if expected is not None else int(lib.ndpp_count_tokens(data, len(data)))
        out = np.empty(cap, dtype=np.float64)
        consumed = ctypes.c_size_t(0)
        n = lib.ndpp_tokenize(
            data,
            len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap,
            ctypes.byref(consumed),
        )
        if n >= 0:
            return out[:n]
        # fall through to the numpy path on parse errors (error reporting there)
    return np.array(data.split(), dtype=np.float64)
