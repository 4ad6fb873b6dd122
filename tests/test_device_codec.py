"""Device-codec invariants: the u32 dense path, packed-code transport and
the arithmetic decoder must agree with the verified u64/host codec
(br_tpu.codec is the ground truth, itself verified against the reference
asset in test_codec.py)."""

import numpy as np

import jax.numpy as jnp

from br_tpu import codec
from br_tpu.correct import device_codec as dc


def _rand_kmers(k, n=4096, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)


def test_revcomp32_matches_host():
    # expected values from the verified host codec: compiling the u64
    # device revcomp here hit XLA's u64 compile pathology (~8 min on the
    # 8-device CPU mesh) for no extra coverage.
    for k in (3, 7, 13, 15):
        km = _rand_kmers(k, seed=k)
        want = np.array([codec.revcomp(int(x), k) for x in km],
                        dtype=np.uint64)
        r32 = np.asarray(dc.revcomp32(jnp.asarray(km.astype(np.uint32)), k))
        assert np.array_equal(want.astype(np.uint32), r32)


def test_canonical_any_matches_host():
    for k in (7, 13):
        km = _rand_kmers(k, seed=10 + k)
        want = np.array([codec.canonical(int(x), k) for x in km[:512]],
                        dtype=np.uint64)
        got32 = np.asarray(dc.canonical_any(
            jnp.asarray(km[:512].astype(np.uint32)), k))
        got64 = np.asarray(dc.canonical_any(
            jnp.asarray(km[:512], jnp.uint64), k))
        assert np.array_equal(got32.astype(np.uint64), want)
        assert np.array_equal(got64, want)


def test_rolling_kmers32_matches_u64():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(4, 200), dtype=np.uint8)
    for k in (5, 13):
        a = np.asarray(dc.rolling_kmers(jnp.asarray(codes), k))
        b = np.asarray(dc.rolling_kmers32(jnp.asarray(codes), k))
        assert np.array_equal(a.astype(np.uint32), b)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=(3, 256), dtype=np.uint8)
    packed = np.asarray(dc.pack_codes(jnp.asarray(codes)))
    assert packed.shape == (3, 64)
    back = np.asarray(dc.unpack_codes(jnp.asarray(packed), 256))
    assert np.array_equal(back, codes)


def test_decode_codes_arithmetic():
    codes = jnp.asarray(np.arange(4, dtype=np.uint8))
    assert np.asarray(dc.decode_codes(codes)).tobytes() == b"ACTG"


def test_solid_probe_any_u32_matches_u64():
    from br_tpu.set.solid import SolidSet

    k = 13
    rng = np.random.default_rng(5)
    genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=3000).tobytes()
    s = SolidSet.from_sequences([genome], k)
    words = jnp.asarray(s.device_words())
    km = _rand_kmers(k, seed=6)
    probe = dc.make_solid_probe_any(words, k)
    got32 = np.asarray(probe(jnp.asarray(km.astype(np.uint32))))
    got64 = np.asarray(probe(jnp.asarray(km, jnp.uint64)))
    want = s.get_many(km)
    assert np.array_equal(got32, want)
    assert np.array_equal(got64, want)
