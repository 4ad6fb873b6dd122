"""2-bit nucleotide codec and canonical k-mer math.

Owns the capabilities br imports from the un-vendored ``cocktail`` crate
(reference call sites: ``src/correct/mod.rs:61,71``, ``src/set/hash.rs:177``,
``src/correct/greedy.rs:139``).  All facts here were verified bit-exactly
against the reference asset ``tests/data/raw.k11.a2.solid``:

* ``nuc2bit(b) = (b >> 1) & 0b11``  => A=0, C=1, T=2, G=3 (case-insensitive;
  non-ACGT bytes go through the same formula — the reference has no N
  handling anywhere),
* complement of a code is ``code ^ 0b10`` (A<->T, C<->G), so the complement
  of a packed k-mer is ``kmer ^ 0b1010...10`` (k groups),
* ``canonical(kmer, k)`` (odd k) is whichever of {kmer, revcomp(kmer)} has
  an even popcount.  Complementing flips exactly one bit per base, so for
  odd k the two variants always differ in popcount parity; exactly one is
  "even".  This is what lets the solid bitfield drop a bit
  (index = canonical >> 1, a 2k-1 bit space).

Scalar helpers operate on Python ints / bytes (used by the oracle
implementation and tests); the ``*_np`` variants are vectorized over numpy
arrays and are the building blocks of the host pipeline; the jax engine has
its own fused versions in ``br_tpu.correct.engine``.
"""

from __future__ import annotations

import numpy as np

#: Maximum supported k (2-bit packing in a u64, same bound as the reference
#: MASK_LOOKUP, src/correct/mod.rs:26-42).
MAX_K = 31

_BIT2NUC = b"ACTG"


def mask(k: int) -> int:
    """All-ones mask over 2k bits (reference ``mask``, src/correct/mod.rs:40-42)."""
    return (1 << (2 * k)) - 1


def comp_mask(k: int) -> int:
    """XOR mask complementing every base of a packed k-mer (0b10 per group)."""
    return int("10" * k, 2)


def nuc2bit(nuc: int) -> int:
    """ASCII byte -> 2-bit code. A=0 C=1 T=2 G=3 (lowercase too)."""
    return (nuc >> 1) & 0b11


def bit2nuc(bit: int) -> int:
    """2-bit code -> ASCII byte (uppercase)."""
    return _BIT2NUC[bit & 0b11]


def seq2bit(seq: bytes) -> int:
    """Pack an ASCII sequence into a 2-bit big-endian-first k-mer."""
    kmer = 0
    for b in seq:
        kmer = (kmer << 2) | nuc2bit(b)
    return kmer


def kmer2seq(kmer: int, k: int) -> bytes:
    """Unpack a k-mer into ASCII (cocktail ``kmer2seq``; greedy.rs:139)."""
    out = bytearray(k)
    for i in range(k - 1, -1, -1):
        out[i] = _BIT2NUC[kmer & 0b11]
        kmer >>= 2
    return bytes(out)


def revcomp(kmer: int, k: int) -> int:
    """Reverse complement of a packed k-mer."""
    c = kmer ^ comp_mask(k)
    out = 0
    for _ in range(k):
        out = (out << 2) | (c & 0b11)
        c >>= 2
    return out


def parity_even(kmer: int) -> bool:
    """True when popcount is even — the canonical-side test (odd k only)."""
    return bin(kmer).count("1") % 2 == 0


def canonical(kmer: int, k: int) -> int:
    """Canonical k-mer: the even-popcount variant of {kmer, revcomp}."""
    return kmer if parity_even(kmer) else revcomp(kmer, k)


def add_nuc_to_end(kmer: int, nuc_code: int, k: int) -> int:
    """Rolling update (reference ``add_nuc_to_end``, src/correct/mod.rs:110-112)."""
    return ((kmer << 2) & mask(k)) ^ nuc_code


def tokenize(seq: bytes, k: int):
    """Yield every forward k-mer of ``seq`` (cocktail ``Tokenizer``)."""
    m = mask(k)
    kmer = 0
    for i, b in enumerate(seq):
        kmer = ((kmer << 2) | nuc2bit(b)) & m
        if i >= k - 1:
            yield kmer


def tokenize_canonical(seq: bytes, k: int):
    """Yield every canonical k-mer of ``seq`` (cocktail ``Canonical``)."""
    for kmer in tokenize(seq, k):
        yield canonical(kmer, k)


# ---------------------------------------------------------------------------
# Vectorized (numpy) versions — host-side batch preparation and counting.
# ---------------------------------------------------------------------------


def encode_ascii_np(ascii_arr: np.ndarray) -> np.ndarray:
    """uint8 ASCII array -> uint8 2-bit codes ((b >> 1) & 3), elementwise."""
    return (ascii_arr >> 1) & np.uint8(3)


def rolling_kmers_np(codes: np.ndarray, k: int) -> np.ndarray:
    """All ``len(codes) - k + 1`` forward k-mers as uint64.

    ``out[j]`` is the k-mer covering ``codes[j : j + k]`` (i.e. the k-mer
    *ending* at position ``j + k - 1``).
    """
    n = codes.shape[0] - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    c64 = codes.astype(np.uint64)
    for t in range(k):
        out |= c64[t : t + n] << np.uint64(2 * (k - 1 - t))
    return out


def revcomp_np(kmers: np.ndarray, k: int) -> np.ndarray:
    """Vectorized reverse complement of packed uint64 k-mers.

    Complement (XOR 0b10 per group), then reverse the 2-bit groups with
    log2 swap steps over the full 64-bit word, then right-align to 2k bits.
    """
    x = kmers ^ np.uint64(comp_mask(k))
    # Reverse 2-bit groups within 64 bits.
    x = ((x & np.uint64(0x3333333333333333)) << np.uint64(2)) | (
        (x & np.uint64(0xCCCCCCCCCCCCCCCC)) >> np.uint64(2)
    )
    x = ((x & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4)) | (
        (x & np.uint64(0xF0F0F0F0F0F0F0F0)) >> np.uint64(4)
    )
    x = ((x & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8)) | (
        (x & np.uint64(0xFF00FF00FF00FF00)) >> np.uint64(8)
    )
    x = ((x & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16)) | (
        (x & np.uint64(0xFFFF0000FFFF0000)) >> np.uint64(16)
    )
    x = (x << np.uint64(32)) | (x >> np.uint64(32))
    return x >> np.uint64(64 - 2 * k)


def popcount_np(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of uint64."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def canonical_np(kmers: np.ndarray, k: int) -> np.ndarray:
    """Vectorized canonical k-mer (even-popcount variant)."""
    even = (popcount_np(kmers) & np.uint64(1)) == 0
    return np.where(even, kmers, revcomp_np(kmers, k))


def decode_np(codes: np.ndarray) -> np.ndarray:
    """uint8 2-bit codes -> uint8 ASCII (uppercase ACTG)."""
    lut = np.frombuffer(_BIT2NUC, dtype=np.uint8)
    return lut[codes & 3]
