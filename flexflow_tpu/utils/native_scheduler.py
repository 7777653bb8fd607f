"""ctypes wrapper over the native scheduler core (native/scheduler_core.cc).

The reference runs its continuous-batching bookkeeping in C++ on a dedicated
CPU task (request_manager.cc:713-1130); this is the same hot path here —
applying a fetched decode horizon's tokens to the request slots in one
native pass instead of an O(n*B) Python loop on the scheduling thread.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsched.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libsched.so"],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ff_process_horizon.restype = ctypes.c_int32
    lib.ff_process_horizon.argtypes = [
        i32p, ctypes.c_int32, ctypes.c_int32,  # tokens, n, b
        i32p, i32p, i32p, i32p, i32p, ctypes.c_int32,  # active..margin
        i32p, ctypes.c_int32,  # eos
        i32p, i32p, ctypes.c_int32,  # stop sets
        i32p, i32p, i32p,  # outputs
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def process_horizon(
    tokens: np.ndarray,  # [n, B] int32
    active: np.ndarray,  # [B] int32 (1 = live)
    out_counts: np.ndarray,  # [B] int32, produced tokens per slot (in/out)
    max_new: np.ndarray,  # [B]
    total_lens: np.ndarray,  # [B] prompt+output lengths (in/out)
    seq_budget: np.ndarray,  # [B]
    horizon_margin: int,
    eos_ids: np.ndarray,  # [n_eos]
    stop_ids: np.ndarray,  # [B, max_stop]
    stop_counts: np.ndarray,  # [B]
):
    """Returns (out_tokens [B, n], out_taken [B], out_finished [B])."""
    lib = _load()
    assert lib is not None
    n, b = tokens.shape
    tokens = np.ascontiguousarray(tokens, np.int32)
    out_tokens = np.zeros((b, n), np.int32)
    out_taken = np.zeros(b, np.int32)
    out_finished = np.zeros(b, np.int32)
    max_stop = stop_ids.shape[1] if stop_ids.size else 0
    lib.ff_process_horizon(
        _p(tokens), n, b,
        _p(np.ascontiguousarray(active, np.int32)),
        _p(out_counts), _p(np.ascontiguousarray(max_new, np.int32)),
        _p(total_lens), _p(np.ascontiguousarray(seq_budget, np.int32)),
        horizon_margin,
        _p(np.ascontiguousarray(eos_ids, np.int32)), len(eos_ids),
        _p(np.ascontiguousarray(stop_ids, np.int32)),
        _p(np.ascontiguousarray(stop_counts, np.int32)), max_stop,
        _p(out_tokens), _p(out_taken), _p(out_finished),
    )
    return out_tokens, out_taken, out_finished
