"""Codec facts, incl. the bit-exact verification against the reference asset."""

import gzip

import numpy as np
import pytest

from br_tpu import codec

REF_DATA = "/root/reference/tests/data"


def test_nuc2bit_table():
    assert [codec.nuc2bit(b) for b in b"ACTG"] == [0, 1, 2, 3]
    assert [codec.nuc2bit(b) for b in b"actg"] == [0, 1, 2, 3]


def test_seq2bit_roundtrip():
    seq = b"ACTGACGTTACGT"
    assert codec.kmer2seq(codec.seq2bit(seq), len(seq)) == seq


def test_revcomp_involution():
    rng = np.random.default_rng(0)
    for k in (5, 11, 17, 31):
        for _ in range(50):
            kmer = int(rng.integers(0, 1 << (2 * k)))
            assert codec.revcomp(codec.revcomp(kmer, k), k) == kmer


def test_canonical_unifies_strands():
    rng = np.random.default_rng(1)
    for k in (5, 11, 31):
        for _ in range(50):
            kmer = int(rng.integers(0, 1 << (2 * k)))
            rc = codec.revcomp(kmer, k)
            assert codec.canonical(kmer, k) == codec.canonical(rc, k)
            assert codec.parity_even(codec.canonical(kmer, k))


def test_np_matches_scalar():
    rng = np.random.default_rng(2)
    for k in (5, 13, 31):
        kmers = rng.integers(0, 1 << (2 * k), size=200, dtype=np.uint64)
        rc = codec.revcomp_np(kmers, k)
        cano = codec.canonical_np(kmers, k)
        for i in range(kmers.size):
            assert int(rc[i]) == codec.revcomp(int(kmers[i]), k)
            assert int(cano[i]) == codec.canonical(int(kmers[i]), k)


def test_rolling_kmers():
    seq = b"ACGTGGGAATTGTGGCCACAT"
    codes = codec.encode_ascii_np(np.frombuffer(seq, np.uint8))
    kmers = codec.rolling_kmers_np(codes, 11)
    expected = list(codec.tokenize(seq, 11))
    assert kmers.tolist() == expected


def test_tokenize_canonical_matches_pcon_forward_property():
    """Forward get on canonical sets: pcon.rs:219-230 `forward` test."""
    from br_tpu.set.solid import SolidSet

    SEQ = (b"ACGTGGGAATTGTGGCCACATCACGAGGTCCTGCGTATTGACGACTGTAAAGCGAGTGGC"
           b"CGTGGAATTTCAAGCTCAATTAGCCGAACCAATCCGCCTA")
    s = SolidSet(11)
    for cano in codec.tokenize_canonical(SEQ, 11):
        s.set(cano, True)
    for kmer in codec.tokenize(SEQ, 11):
        assert s.get(kmer)
    assert not s.get(0)
    assert s.k == 11


@pytest.mark.slow
def test_solid_asset_bit_exact():
    """Count raw.fasta at k=11, threshold at abundance 2, compare every bit
    of the bitfield with the reference asset raw.k11.a2.solid."""
    from br_tpu.count import Counter
    from br_tpu.io.fasta import read_records

    counter = Counter(11)
    for _d, seq, _q in read_records(f"{REF_DATA}/raw.fasta"):
        counter.count_sequence(seq)
    solid = counter.to_solid(2)

    raw = gzip.open(f"{REF_DATA}/raw.k11.a2.solid", "rb").read()
    assert raw[0] == 11
    ref_bits = np.frombuffer(raw[1:], dtype=np.uint8)
    assert np.array_equal(solid.bits, ref_bits)


def test_solid_serialization_roundtrip(tmp_path):
    from br_tpu.set.solid import SolidSet

    s = SolidSet(7)
    for kmer in codec.tokenize(b"GAGCGTACGTTGGAT", 7):
        s.set(kmer, True)
    path = str(tmp_path / "x.solid")
    s.save(path)
    loaded = SolidSet.load(path)
    assert loaded.k == 7
    assert np.array_equal(loaded.bits, s.bits)


def test_solid_asset_loads():
    from br_tpu.set.solid import SolidSet

    s = SolidSet.load(f"{REF_DATA}/raw.k11.a2.solid")
    assert s.k == 11
    assert s.count_ones() == 123072
