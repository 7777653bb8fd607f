"""ctypes wrapper over the native safetensors reader (native/safetensors_reader.cc).

Zero-copy: tensors are numpy views straight into the mmap'd file. Builds the
shared library on first use if g++ is available; callers should fall back to
the pure-python ``safetensors`` package when unavailable
(see utils/hf_weights.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstx.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # no numpy bf16; exposed as uint16 raw bits
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}

_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    src = os.path.join(_NATIVE_DIR, "safetensors_reader.cc")
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-o",
             _LIB_PATH, src],
            check=True, capture_output=True,
        )
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.stx_open.restype = ctypes.c_void_p
    lib.stx_open.argtypes = [ctypes.c_char_p]
    lib.stx_error.restype = ctypes.c_char_p
    lib.stx_error.argtypes = [ctypes.c_void_p]
    lib.stx_num_tensors.restype = ctypes.c_int
    lib.stx_num_tensors.argtypes = [ctypes.c_void_p]
    lib.stx_name.restype = ctypes.c_char_p
    lib.stx_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.stx_dtype.restype = ctypes.c_char_p
    lib.stx_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.stx_ndim.restype = ctypes.c_int
    lib.stx_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.stx_shape.argtypes = [ctypes.c_void_p, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_int64)]
    lib.stx_data.restype = ctypes.c_void_p
    lib.stx_data.argtypes = [ctypes.c_void_p, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int64)]
    lib.stx_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeSafetensors:
    """Mapping-like zero-copy view over one .safetensors file."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native safetensors reader unavailable")
        self._lib = lib
        self._h = lib.stx_open(path.encode())
        err = lib.stx_error(self._h)
        if err:
            msg = err.decode()
            lib.stx_close(self._h)
            self._h = None
            raise ValueError(f"safetensors open failed: {msg} ({path})")
        self._index: Dict[str, int] = {}
        for i in range(lib.stx_num_tensors(self._h)):
            self._index[lib.stx_name(self._h, i).decode()] = i

    def keys(self):
        return self._index.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def __getitem__(self, name: str) -> np.ndarray:
        i = self._index[name]
        lib = self._lib
        ndim = lib.stx_ndim(self._h, i)
        shape = (ctypes.c_int64 * max(ndim, 1))()
        lib.stx_shape(self._h, i, shape)
        nbytes = ctypes.c_int64()
        ptr = lib.stx_data(self._h, i, ctypes.byref(nbytes))
        dtype_s = lib.stx_dtype(self._h, i).decode()
        np_dtype = _DTYPES.get(dtype_s)
        buf = (ctypes.c_char * nbytes.value).from_address(ptr)
        if np_dtype is None:  # BF16: raw uint16 bits, converted to float32
            raw = np.frombuffer(buf, dtype=np.uint16).reshape(
                tuple(shape[:ndim]))
            return (raw.astype(np.uint32) << 16).view(np.float32)
        return np.frombuffer(buf, dtype=np_dtype).reshape(tuple(shape[:ndim]))

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self._index:
            yield k, self[k]

    def close(self):
        if self._h is not None:
            self._lib.stx_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
