"""Device-side (jax) k-mer math: the building blocks of the TPU engine.

64-bit k-mers (x64 enabled; XLA emulates u64 as u32 pairs on TPU — all ops
here are shifts/xor/popcount which lower to cheap VPU work).  Membership
probes gather one uint32 word of the HBM-resident bitfield per k-mer.

Mirrors ``br_tpu.codec`` (host) — kept in sync by tests/test_engine.py.
"""

from __future__ import annotations

import functools
import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compile cache: opt-in via BR_TPU_JAX_CACHE=/path (bench.py
# sets it by default).  The r3 deadlock (compilation_cache.py
# combine_executable_and_time hanging on a futex) reproduced only with
# CONCURRENT compiles; single-threaded cache writes are safe (verified
# on-chip r4), so warmup runs serial whenever the cache is active.
_cache_dir = os.environ.get("BR_TPU_JAX_CACHE")
if _cache_dir:  # pragma: no cover - opt-in
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402

U64 = jnp.uint64


def _u(x: int):
    return jnp.uint64(x)


def mask(k: int) -> int:
    return (1 << (2 * k)) - 1


def comp_mask(k: int) -> int:
    return int("10" * k, 2)


def add_nuc(kmer, code, k: int):
    """Rolling update; ``code`` is a 2-bit base (any int dtype)."""
    return ((kmer << _u(2)) & _u(mask(k))) ^ code.astype(U64)


def revcomp(kmer, k: int):
    x = kmer ^ _u(comp_mask(k))
    x = ((x & _u(0x3333333333333333)) << _u(2)) | ((x & _u(0xCCCCCCCCCCCCCCCC)) >> _u(2))
    x = ((x & _u(0x0F0F0F0F0F0F0F0F)) << _u(4)) | ((x & _u(0xF0F0F0F0F0F0F0F0)) >> _u(4))
    x = ((x & _u(0x00FF00FF00FF00FF)) << _u(8)) | ((x & _u(0xFF00FF00FF00FF00)) >> _u(8))
    x = ((x & _u(0x0000FFFF0000FFFF)) << _u(16)) | ((x & _u(0xFFFF0000FFFF0000)) >> _u(16))
    x = (x << _u(32)) | (x >> _u(32))
    return x >> _u(64 - 2 * k)


def canonical(kmer, k: int):
    even = (jax.lax.population_count(kmer) & _u(1)) == _u(0)
    return jnp.where(even, kmer, revcomp(kmer, k))


def make_solid_probe(words, k: int):
    """Membership closure over a device uint32 bitfield.

    ``probe(kmer) -> bool``: canonicalize, drop the parity bit, gather the
    word, test the bit.  Works elementwise on any-shaped kmer arrays.
    """

    def probe(kmer):
        cano = canonical(kmer, k)
        idx = cano >> _u(1)
        widx = (idx >> _u(5)).astype(jnp.int32)
        bit = (idx & _u(31)).astype(jnp.uint32)
        w = words[widx]
        return ((w >> bit) & jnp.uint32(1)) == jnp.uint32(1)

    return probe


# -- 32-bit dense path (k <= 16, i.e. 2k <= 32 bits) ------------------------
#
# The per-position dense work (rolling k-mers + canonicalize + probe over
# every base of a batch) is the hot loop of a pass; XLA emulates uint64 as
# uint32 pairs on TPU, so for the headline k range (13..15) doing the dense
# phase in native uint32 halves the VPU work.

U32 = jnp.uint32


def kmer_dtype(k: int):
    """Narrowest device dtype that holds a 2k-bit k-mer."""
    return U32 if 2 * k <= 32 else U64


def revcomp32(kmer, k: int):
    x = kmer ^ U32(comp_mask(k) & 0xFFFFFFFF)
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    x = (x << U32(16)) | (x >> U32(16))
    return x >> U32(32 - 2 * k)


def canonical_any(kmer, k: int):
    """pcon canonical rule (even-popcount keeps the k-mer) for u32 or u64."""
    one = kmer.dtype.type(1)
    zero = kmer.dtype.type(0)
    even = (jax.lax.population_count(kmer) & one) == zero
    rc = revcomp32(kmer, k) if kmer.dtype == U32 else revcomp(kmer, k)
    return jnp.where(even, kmer, rc)


def make_solid_probe_any(words, k: int):
    """make_solid_probe for k-mer arrays of any unsigned dtype."""

    def probe(kmer):
        cano = canonical_any(kmer, k)
        idx = cano >> kmer.dtype.type(1)
        widx = (idx >> kmer.dtype.type(5)).astype(jnp.int32)
        bit = (idx & kmer.dtype.type(31)).astype(jnp.uint32)
        w = words[widx]
        return ((w >> bit) & jnp.uint32(1)) == jnp.uint32(1)

    return probe


def make_hash_probe_any(table, k: int):
    """make_hash_probe accepting u32 k-mer arrays (upcasts to u64)."""
    p64 = make_hash_probe(table, k)

    def probe(kmer):
        return p64(kmer.astype(U64))

    return probe


def unpack_codes(packed, L: int):
    """(… , L//4) uint8 with 4 LSB-first 2-bit codes per byte -> (…, L)."""
    sh = (jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2))
    c = (packed[..., :, None] >> sh) & jnp.uint8(3)
    return c.reshape(packed.shape[:-1] + (L,))


def pack_codes(codes):
    """Inverse of unpack_codes; last axis length must be a multiple of 4."""
    L = codes.shape[-1]
    c = codes.reshape(codes.shape[:-1] + (L // 4, 4)).astype(jnp.uint8)
    return (c[..., 0] | (c[..., 1] << jnp.uint8(2))
            | (c[..., 2] << jnp.uint8(4)) | (c[..., 3] << jnp.uint8(6)))


def make_hash_probe(table, k: int):
    """Membership closure over a sorted uint64 canonical-k-mer table
    (the large-k backend): branchless binary search, ~log2(n) gathers."""
    n = int(table.shape[0])
    levels = max(0, (n - 1).bit_length())

    def probe(kmer):
        cano = canonical(kmer, k)
        pos = jnp.zeros(jnp.shape(cano), dtype=jnp.int32)
        for level in reversed(range(levels)):
            step = 1 << level
            cand = pos + step
            cand_c = jnp.minimum(cand, n - 1)
            go = table[cand_c] <= cano
            pos = jnp.where(go, cand_c, pos)
        return table[pos] == cano

    return probe


def encode_ascii(ascii_arr):
    return ((ascii_arr >> 1) & jnp.uint8(3)).astype(jnp.uint8)


import numpy as _np

_DECODE_LUT = _np.frombuffer(b"ACTG", dtype=_np.uint8)


def decode_codes(codes):
    """2-bit code -> ascii base, arithmetically (no table gather):
    A=65, C=67, T=84, G=71."""
    c = codes & jnp.uint8(3)
    return (jnp.uint8(65)
            + jnp.where(c == 1, jnp.uint8(2), jnp.uint8(0))
            + jnp.where(c == 2, jnp.uint8(19), jnp.uint8(0))
            + jnp.where(c == 3, jnp.uint8(6), jnp.uint8(0)))


@functools.partial(jax.jit, static_argnums=(1,))
def rolling_kmers(codes, k: int):
    """End-indexed rolling k-mers: out[j] covers codes[j-k+1 : j+1]
    (defined for j >= k-1; positions below hold partial garbage)."""
    c = codes.astype(U64)
    out = jnp.zeros_like(c)
    for t in range(k):
        shifted = jnp.roll(c, t, axis=-1) << _u(2 * t)
        out = out | shifted
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def rolling_kmers32(codes, k: int):
    """rolling_kmers in uint32 (valid for 2k <= 32)."""
    c = codes.astype(U32)
    out = jnp.zeros_like(c)
    for t in range(k):
        out = out | (jnp.roll(c, t, axis=-1) << U32(2 * t))
    return out
