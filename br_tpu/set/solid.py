"""Dense solid-k-mer bitfield (the pcon ``Solid`` equivalent).

One bit per canonical k-mer, ``2**(2k-1)`` bits total (the canonical
half-space enabled by odd k + the even-popcount canonical rule; see
``br_tpu.codec``).  Index of a canonical k-mer is ``canonical >> 1``,
LSB-first within bytes.  k=11 => 256 KiB, k=13 => 4 MiB, k=15 => 64 MiB,
k=17 => 1 GiB — replicated per chip in HBM for the correction phase.

File format (verified against the reference asset
``tests/data/raw.k11.a2.solid``): ``gzip(k: u8 || bitfield bytes)``.

Reference behavior being reproduced: pcon ``Solid`` as used at
src/set/pcon.rs:13-196 and src/main.rs:87-115 (``from_count`` with the
strictly-greater abundance rule, verified bit-exactly).
"""

from __future__ import annotations

import gzip
import io as _io
from typing import Iterable

import numpy as np

from br_tpu import codec


class SolidSet:
    """Bitfield-backed canonical k-mer membership set."""

    def __init__(self, k: int, bits: np.ndarray | None = None):
        if not (1 <= k <= codec.MAX_K):
            raise ValueError(f"k must be in [1, {codec.MAX_K}], got {k}")
        if k % 2 == 0:
            raise ValueError("k must be odd (canonical half-space requires it)")
        self._k = k
        nbits = 1 << (2 * k - 1)
        nbytes = max(1, nbits // 8)
        if bits is None:
            self.bits = np.zeros(nbytes, dtype=np.uint8)
        else:
            if bits.shape != (nbytes,) or bits.dtype != np.uint8:
                raise ValueError("bitfield shape/dtype mismatch")
            self.bits = bits

    # -- core interface (reference src/set.rs:17-21) ------------------------

    @property
    def k(self) -> int:
        return self._k

    def get(self, kmer: int) -> bool:
        """Membership of a *forward* k-mer (canonicalizes internally)."""
        idx = codec.canonical(kmer, self._k) >> 1
        return bool((self.bits[idx >> 3] >> (idx & 7)) & 1)

    def set(self, kmer: int, value: bool = True) -> None:
        """Set/clear membership of a k-mer (canonicalizes internally)."""
        idx = codec.canonical(kmer, self._k) >> 1
        if value:
            self.bits[idx >> 3] |= np.uint8(1 << (idx & 7))
        else:
            self.bits[idx >> 3] &= np.uint8(~(1 << (idx & 7)) & 0xFF)

    # -- vectorized host operations ----------------------------------------

    def set_many(self, kmers: np.ndarray) -> None:
        """Set bits for an array of forward uint64 k-mers."""
        if kmers.size == 0:
            return
        idx = codec.canonical_np(kmers, self._k) >> np.uint64(1)
        np.bitwise_or.at(
            self.bits, (idx >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
        )

    def get_many(self, kmers: np.ndarray) -> np.ndarray:
        """Vectorized membership for forward uint64 k-mers -> bool array."""
        if kmers.size == 0:
            return np.zeros(0, dtype=bool)
        idx = codec.canonical_np(kmers, self._k) >> np.uint64(1)
        byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
        return ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)

    def extend(self, other: "SolidSet") -> None:
        """Bitwise-OR union (reference map-reduce merge, src/set/pcon.rs:101-107)."""
        if other.k != self._k:
            raise ValueError("k mismatch in SolidSet.extend")
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def count_ones(self) -> int:
        return int(np.unpackbits(self.bits).sum())

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_count(cls, k: int, counts: np.ndarray, abundance: int) -> "SolidSet":
        """Threshold a canonical-index count array: solid iff count > abundance.

        (Strictly greater — verified bit-exactly against the k=11/a=2 asset.)
        """
        if counts.shape[0] != (1 << (2 * k - 1)):
            raise ValueError("count array must cover the canonical half-space")
        solid = counts > abundance
        self = cls(k)
        self.bits = np.packbits(solid, bitorder="little")
        return self

    @classmethod
    def from_sequences(cls, seqs: Iterable[bytes], k: int) -> "SolidSet":
        """Every k-mer of every sequence becomes solid (reference from_fasta,
        src/set/pcon.rs:47-112; sequences shorter than k are skipped)."""
        self = cls(k)
        for seq in seqs:
            if len(seq) >= k:
                arr = np.frombuffer(seq, dtype=np.uint8)
                self.set_many(codec.rolling_kmers_np(codec.encode_ascii_np(arr), k))
        return self

    @classmethod
    def from_csv(cls, stream, k: int) -> "SolidSet":
        """First CSV column is a k-mer string (reference src/set/pcon.rs:27-45).

        Mirrors the rust ``csv`` crate default: the first row is a header and
        is skipped.
        """
        self = cls(k)
        first = True
        for line in stream:
            if isinstance(line, bytes):
                line = line.decode()
            line = line.strip()
            if not line:
                continue
            if first:
                first = False
                continue
            field = line.split(",")[0]
            if not field:
                from br_tpu.errors import CsvMissingFirstColumn

                raise CsvMissingFirstColumn()
            self.set(codec.seq2bit(field.encode()))
        return self

    # -- (de)serialization (gzip'd pcon format) -----------------------------

    @classmethod
    def from_stream(cls, stream) -> "SolidSet":
        """Load the gzip'd ``k || bitfield`` artifact (src/set/pcon.rs:18-25)."""
        data = stream.read()
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        k = data[0]
        bits = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return cls(k, bits)

    @classmethod
    def load(cls, path: str) -> "SolidSet":
        with open(path, "rb") as fh:
            return cls.from_stream(fh)

    def to_stream(self, stream, compresslevel: int = 6) -> None:
        payload = bytes([self._k]) + self.bits.tobytes()
        stream.write(gzip.compress(payload, compresslevel=compresslevel))

    def save(self, path: str) -> None:
        with open(path, "wb") as fh:
            self.to_stream(fh)

    def to_bytes(self) -> bytes:
        buf = _io.BytesIO()
        self.to_stream(buf)
        return buf.getvalue()

    # -- device view ---------------------------------------------------------

    def device_words(self) -> np.ndarray:
        """The bitfield as little-endian uint32 words for device gathers.

        Bit ``idx`` lives in word ``idx >> 5`` at position ``idx & 31`` —
        consistent with the LSB-first byte layout.
        """
        b = self.bits
        if b.size % 4:
            b = np.pad(b, (0, 4 - b.size % 4))
        return b.view(np.uint32)
