"""On-device solid-set construction: count + threshold + bit-pack in HBM.

TPU-first replacement for the host count-then-transfer flow (SURVEY §7.1
step 7).  The host ships only the 2-bit-packed reads (~0.6 MB for the
reference corpus); counting is a device scatter-add over the canonical
half-space, thresholding and bit-packing stay on device, and the bitfield
never crosses the wire.  This matters enormously at k = 17, where the
bitfield is 2^33 bits = 1 GiB and a host->device transfer takes ~18 min
at relay bandwidth, but the packed reads still take ~1 s.

Memory: exact u32 counts over the full half-space would need 2^(2k-1)*4 B
(32 GiB at k = 17), so the index space is swept in partitions sized to
``max_count_bytes``; each partition re-scans every k-mer (VPU-cheap) and
scatter-adds only its own range.  Threshold semantics match
``SolidSet.from_count`` (strictly greater); exact u32 counts agree with
the host's saturating-u8 counts for every abundance < 255
(255 > a  <=>  true_count > a).

Reference parity: pcon ``Counter::count_fasta`` + ``Solid::from_count``
(src/main.rs:73-114) — same canonical index space, same threshold rule,
verified against the host path in tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct import device_codec as dc

I32 = jnp.int32
U8 = jnp.uint8
U32 = jnp.uint32


def _pack_reads(seqs, k: int):
    """Flat-pack reads into one 2-bit code buffer + validity mask bounds.

    Returns (packed u8 (ceil(T/4),), starts (R,) i32, lens (R,) i32, T).
    """
    # drop len<k reads up front: a zero-length read would duplicate an
    # entry in `starts`, collapsing in the rstart scatter below and
    # shifting read_id/pin for every later read (silent count skew); the
    # host Counter skips them too, so dropping preserves parity.
    seqs = [s for s in seqs if len(s) >= k]
    total = sum(len(s) for s in seqs)
    T = total + (-total) % 32
    codes = np.zeros(T, dtype=np.uint8)
    starts = np.zeros(len(seqs), dtype=np.int64)
    lens = np.zeros(len(seqs), dtype=np.int64)
    off = 0
    for r, s in enumerate(seqs):
        arr = np.frombuffer(s, dtype=np.uint8)
        codes[off : off + len(arr)] = (arr >> 1) & 3
        starts[r] = off
        lens[r] = len(arr)
        off += len(arr)
    b4 = codes.reshape(T // 4, 4)
    packed = (b4[:, 0] | (b4[:, 1] << 2) | (b4[:, 2] << 4) | (b4[:, 3] << 6))
    # per-position validity: pos >= start + k - 1 and pos < start + len
    # encoded as the read-start table (device recomputes via cummax)
    rstart = np.zeros(T, dtype=np.int64)
    rstart[starts] = 1
    read_id = np.cumsum(rstart) - 1
    pin = np.arange(T, dtype=np.int64) - starts[read_id]
    valid = (pin >= k - 1) & (pin < lens[read_id])
    vpack = np.packbits(valid, bitorder="little")
    if vpack.size % 4:
        vpack = np.pad(vpack, (0, 4 - vpack.size % 4))
    return packed, vpack.view(np.uint32), T


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _count_partition(packed, vwords, k: int, T: int, psize: int, pbase):
    """u32 counts for canonical indices in [pbase, pbase + psize)."""
    codes = dc.unpack_codes(packed, T)
    if k <= 15:
        kmers = dc.rolling_kmers32(codes, k)
        cano = dc.canonical_any(kmers, k)
        idx = (cano >> U32(1)).astype(jnp.int64)
    else:
        kmers = dc.rolling_kmers(codes, k)
        cano = dc.canonical_any(kmers, k)
        idx = (cano >> jnp.uint64(1)).astype(jnp.int64)
    pos = jnp.arange(T, dtype=I32)
    vbit = (vwords[pos // 32] >> (pos % 32).astype(U32)) & U32(1)
    local = idx - pbase
    ok = (vbit == 1) & (local >= 0) & (local < psize)
    # psize <= 2^29 (max_count_bytes cap), so local fits i32
    target = jnp.where(ok, local, psize).astype(jnp.int32)
    counts = jnp.zeros(psize + 1, dtype=U32)
    counts = counts.at[target].add(1)
    return counts[:psize]


@functools.partial(jax.jit, static_argnums=(1,))
def _threshold_pack(counts, psize: int, abundance):
    """bits[i] = counts[i] > abundance, packed into u32 words."""
    solid = (counts > abundance.astype(U32)).astype(U32)
    w = solid.reshape(psize // 32, 32)
    shifts = jnp.arange(32, dtype=U32)[None, :]
    return jnp.sum(w << shifts, axis=1, dtype=U32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _solid_words_by_sort(packed, vwords, k: int, T: int, abundance):
    """Sort + run-length counting straight into the bitfield.

    The r4 partitioned dense histogram swept 2^(2k+1) count bytes per
    build (16 x 2 GiB zero/threshold passes at k=17 -> ~4 min on chip);
    the corpus only holds ~T distinct k-mers, so sorting the T canonical
    k-mers (sentinel-masking invalid positions), run-length encoding,
    and scattering one bit per solid k-mer touches O(T) + one bitfield
    sweep instead.  Distinct k-mers map to distinct (word, bit), so
    scatter-ADD of single bits equals scatter-OR.  Threshold semantics:
    strictly-greater on exact counts (== the host's saturating-u8
    semantics for abundance < 255)."""
    codes = dc.unpack_codes(packed, T)
    if k <= 15:
        kmers = dc.rolling_kmers32(codes, k)
        cano = dc.canonical_any(kmers, k).astype(jnp.uint64)
    else:
        kmers = dc.rolling_kmers(codes, k)
        cano = dc.canonical_any(kmers, k)
    pos = jnp.arange(T, dtype=I32)
    vbit = (vwords[pos // 32] >> (pos % 32).astype(U32)) & U32(1)
    SENT = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    cano = jnp.where(vbit == 1, cano, SENT)
    s = jnp.sort(cano)
    # run starts: first element or different from predecessor
    prev = jnp.concatenate([jnp.full(1, ~s[0], s.dtype), s[:-1]])
    is_start = (s != prev) & (s != SENT)
    ridx = jnp.cumsum(is_start.astype(I32), dtype=I32)  # 1-based run id
    n_runs = ridx[-1]
    # run lengths via first-position scatter of start offsets
    starts = jnp.zeros(T + 1, I32).at[
        jnp.where(is_start, ridx - 1, T + 1)].set(pos, mode="drop")
    starts = starts.at[jnp.minimum(n_runs, T)].set(
        jnp.sum((s != SENT).astype(I32), dtype=I32))
    runlen = jnp.concatenate([starts[1:], starts[-1:]]) - starts
    # solid runs: count > abundance
    solid = (jnp.arange(T + 1, dtype=I32) < n_runs) & \
        (runlen > abundance.astype(I32))
    run_kmer = s[jnp.clip(starts, 0, T - 1)]
    idx = (run_kmer >> jnp.uint64(1))
    widx = (idx >> jnp.uint64(5)).astype(jnp.int32)
    bit = (idx & jnp.uint64(31)).astype(U32)
    half = 1 << (2 * k - 1)
    words = jnp.zeros(half // 32, U32).at[
        jnp.where(solid, widx, half // 32)].add(
        U32(1) << bit, mode="drop")
    return words


def build_solid_words_on_device(seqs, k: int, abundance: int,
                                max_count_bytes: int = 2 << 30):
    """Count + threshold on device; returns the bitfield as a DEVICE u32
    word array compatible with ``SolidSet.device_words()`` layout.

    Default path: sort + run-length counting (O(corpus) work + one
    bitfield init).  Set ``max_count_bytes`` < 0 to force the legacy
    partitioned dense-histogram path (kept for differential testing)."""
    packed, vwords, T = _pack_reads(seqs, k)
    d_packed = jax.device_put(packed)
    d_vwords = jax.device_put(vwords)

    if max_count_bytes >= 0 and T > 0:
        return _solid_words_by_sort(d_packed, d_vwords, k, T,
                                    jnp.int32(abundance))

    half = 1 << (2 * k - 1)
    mcb = abs(max_count_bytes) or (2 << 30)
    nparts = max(1, (half * 4 + mcb - 1) // mcb)
    # half is a power of two, so psize * nparts == half only holds when
    # nparts is too; round up (ceil-division alone gives e.g. nparts=11
    # for 3 GiB at k=17, which does not divide 2^33)
    nparts = 1 << (nparts - 1).bit_length()
    psize = half // nparts
    assert psize % 32 == 0 and psize * nparts == half

    parts = []
    for p in range(nparts):
        counts = _count_partition(d_packed, d_vwords, k, T, psize,
                                  jnp.int64(p * psize))
        parts.append(_threshold_pack(counts, psize,
                                     jnp.uint32(abundance)))
    if nparts == 1:
        return parts[0]
    return jnp.concatenate(parts)


def device_words_to_solid(words, k: int):
    """Materialize a host SolidSet from a device word array (for the
    native/oracle fallback paths; costs a device->host transfer)."""
    from br_tpu.set.solid import SolidSet

    s = SolidSet(k)
    s.bits = np.asarray(words).view(np.uint8)[: (1 << (2 * k - 1)) // 8]
    return s
