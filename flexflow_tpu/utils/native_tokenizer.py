"""Byte-level BPE tokenizer over the native C++ merge core (native/bpe_core.cc).

TPU-native counterpart of the reference's standalone tokenizer
(/root/reference/src/runtime/gpt_tokenizer.cc + include/flexflow/gpt_tokenizer.h
— GPT2/OPT byte-level BPE from vocab+merges files). The Python side does the
GPT-2 regex pre-tokenization and byte<->unicode mapping; the C++ core runs
the merge loop and vocab lookups (with a word cache, like the reference).
"""

from __future__ import annotations

import ctypes
import json
import os
import re
import subprocess
from typing import Dict, List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbpe.so")

# GPT-2 pre-tokenization pattern, approximated for the stdlib `re` module
# (\p{L}/\p{N} -> str.isalpha/isdigit handled via [^\W\d_] classes).
_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE,
)

_lib = None


def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte->printable-unicode table (matches HF/reference exactly)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "bpe_core.cc")
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-o",
                 _LIB_PATH, src],
                check=True, capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_add_token.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
    lib.bpe_set_unk.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.bpe_add_merge.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_char_p, ctypes.c_int32]
    lib.bpe_encode_word.restype = ctypes.c_int32
    lib.bpe_encode_word.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.c_int32]
    lib.bpe_id_to_token.restype = ctypes.c_char_p
    lib.bpe_id_to_token.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeBPETokenizer:
    """GPT-2-style byte-level BPE from vocab.json + merges.txt."""

    def __init__(self, vocab: Dict[str, int], merges: List[str]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native BPE core unavailable")
        self._lib = lib
        self._h = lib.bpe_create()
        self._byte_enc = _bytes_to_unicode()
        self._byte_dec = {v: k for k, v in self._byte_enc.items()}
        self._vocab = vocab
        for tok, idx in vocab.items():
            lib.bpe_add_token(self._h, tok.encode(), idx)
        lib.bpe_set_unk(self._h, vocab.get("<unk>", 0))
        for rank, line in enumerate(merges):
            parts = line.strip().split(" ")
            if len(parts) != 2:
                continue
            lib.bpe_add_merge(self._h, parts[0].encode(), parts[1].encode(),
                              rank)
        self._buf = (ctypes.c_int32 * 4096)()

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str) -> "NativeBPETokenizer":
        with open(vocab_path) as f:
            vocab = json.load(f)
        with open(merges_path) as f:
            merges = f.read().splitlines()
        if merges and merges[0].startswith("#"):
            merges = merges[1:]
        return cls(vocab, merges)

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in _PAT.findall(text):
            mapped = "".join(self._byte_enc[b] for b in word.encode("utf-8"))
            n = self._lib.bpe_encode_word(self._h, mapped.encode(), self._buf,
                                          len(self._buf))
            if n < 0:
                raise ValueError("word too long for BPE buffer")
            ids.extend(self._buf[:n])
        return ids

    def decode(self, ids: List[int]) -> str:
        text = "".join(
            self._lib.bpe_id_to_token(self._h, int(i)).decode()
            for i in ids
        )
        data = bytes(self._byte_dec[c] for c in text if c in self._byte_dec)
        return data.decode("utf-8", errors="replace")

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.bpe_free(self._h)
                self._h = None
        except Exception:
            pass
