"""ctypes bindings for the native CPU correction engine.

Builds on first use (g++ is in the image; no pybind11 needed).  The
``NativeCorrector`` mirrors the rayon pipeline of the reference: a thread
pool corrects a batch of reads in parallel (the C call releases the GIL)
with order-preserving collection (src/lib.rs:93-132).
"""

from __future__ import annotations

import ctypes
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_KIND = {"one": 0, "two": 1, "graph": 2, "greedy": 3, "gap-size": 4}


def _load():
    from br_tpu.native.build import build

    lib = ctypes.CDLL(build())
    lib.br_create_solid.restype = ctypes.c_void_p
    lib.br_create_solid.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_int]
    lib.br_create_hash.restype = ctypes.c_void_p
    lib.br_create_hash.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                   ctypes.c_uint64, ctypes.c_int]
    lib.br_destroy.argtypes = [ctypes.c_void_p]
    lib.br_correct.restype = ctypes.c_long
    lib.br_correct.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_long]
    return lib


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class NativeCorrector:
    """CPU batch corrector over the native engine (the CPU baseline)."""

    def __init__(self, valid_kmer, corrections, confirm: int, max_search: int,
                 threads: int = 0):
        from br_tpu.set.hash import HashSet
        from br_tpu.set.solid import SolidSet

        lib = get_lib()
        self.k = valid_kmer.k
        if isinstance(valid_kmer, SolidSet):
            payload = valid_kmer.bits.tobytes()
            self._ctx = lib.br_create_solid(payload, len(payload), self.k)
        elif isinstance(valid_kmer, HashSet):
            table = np.ascontiguousarray(valid_kmer.sorted_table())
            ptr = table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
            self._ctx = lib.br_create_hash(ptr, table.size, self.k)
            self._table_keepalive = table
        else:
            raise TypeError("valid_kmer must be SolidSet or HashSet")
        kinds = [_KIND[c.lower().replace("_", "-")] for c in corrections]
        self._kinds = (ctypes.c_int * len(kinds))(*kinds)
        self._n = len(kinds)
        self.confirm = confirm
        self.max_search = max_search
        self._pool = ThreadPoolExecutor(max_workers=threads or os.cpu_count())

    def _one(self, seq: bytes, two_side: bool) -> bytes:
        lib = get_lib()
        cap = len(seq) * 2 + 256
        out = ctypes.create_string_buffer(cap)
        n = lib.br_correct(self._ctx, seq, len(seq), self._kinds, self._n,
                           self.confirm, self.max_search, int(two_side),
                           out, cap)
        if n < 0:  # grow and retry
            cap = -n + 16
            out = ctypes.create_string_buffer(cap)
            n = lib.br_correct(self._ctx, seq, len(seq), self._kinds, self._n,
                               self.confirm, self.max_search, int(two_side),
                               out, cap)
        return out.raw[:n]

    def correct_batch(self, seqs, two_side: bool):
        return list(self._pool.map(lambda s: self._one(s, two_side), seqs))

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_ctx", None):
                get_lib().br_destroy(self._ctx)
        except Exception:
            pass
