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

# Persistent compile cache: the engine's pass programs are large; caching
# them makes CLI cold-start and repeated benchmarks cheap.
_cache_dir = os.environ.get(
    "BR_TPU_JAX_CACHE", os.path.expanduser("~/.cache/br_tpu_jax"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
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
    return jnp.asarray(_DECODE_LUT)[codes & jnp.uint8(3)]


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
