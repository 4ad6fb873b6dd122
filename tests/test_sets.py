"""Set-layer invariants (ported from src/set/pcon.rs:198-254 and
src/set/hash.rs:185-241) plus vectorized/scalar agreement."""

import numpy as np

from br_tpu import codec
from br_tpu.set import HashSet, SolidSet

SEQ = (b"ACGTGGGAATTGTGGCCACATCACGAGGTCCTGCGTATTGACGACTGTAAAGCGAGTGGCCGTGG"
       b"AATTTCAAGCTCAATTAGCCGAACCAATCCGCCTA")


def _fill(setobj, k):
    for cano in codec.tokenize_canonical(SEQ, k):
        setobj.set(cano, True)
    return setobj


def test_pcon_canonical():
    s = _fill(SolidSet(11), 11)
    for cano in codec.tokenize_canonical(SEQ, 11):
        assert s.get(cano)


def test_pcon_forward():
    s = _fill(SolidSet(11), 11)
    for kmer in codec.tokenize(SEQ, 11):
        assert s.get(kmer)


def test_pcon_absence():
    s = _fill(SolidSet(11), 11)
    assert not s.get(0)


def test_pcon_k():
    assert _fill(SolidSet(11), 11).k == 11


def test_hash_canonical_forward_absence_k():
    h = HashSet.from_sequences([SEQ], 11)
    for cano in codec.tokenize_canonical(SEQ, 11):
        assert h.get(cano)
    for kmer in codec.tokenize(SEQ, 11):
        assert h.get(kmer)
    assert not h.get(0)
    assert h.k == 11


def test_solid_hash_agree():
    s = SolidSet.from_sequences([SEQ], 11)
    h = HashSet.from_sequences([SEQ], 11)
    rng = np.random.default_rng(3)
    probes = rng.integers(0, 1 << 22, size=500, dtype=np.uint64)
    for p in probes:
        assert s.get(int(p)) == h.get(int(p))
    assert np.array_equal(s.get_many(probes), h.get_many(probes))


def test_get_many_matches_get():
    s = SolidSet.from_sequences([SEQ], 11)
    rng = np.random.default_rng(4)
    probes = rng.integers(0, 1 << 22, size=300, dtype=np.uint64)
    vec = s.get_many(probes)
    for i, p in enumerate(probes):
        assert bool(vec[i]) == s.get(int(p))


def test_extend_union():
    a = SolidSet.from_sequences([SEQ[:50]], 11)
    b = SolidSet.from_sequences([SEQ[40:]], 11)
    u = SolidSet.from_sequences([SEQ[:50], SEQ[40:]], 11)
    a.extend(b)
    assert np.array_equal(a.bits, u.bits)


def test_from_csv_header_skipped():
    import io

    csv = io.BytesIO(b"kmer,count\nACGTGGGAATT,5\nTTGTGGCCACA,9\n")
    s = SolidSet.from_csv(io.TextIOWrapper(csv), 11)
    assert s.get(codec.seq2bit(b"ACGTGGGAATT"))
    assert s.get(codec.seq2bit(b"TTGTGGCCACA"))
    assert not s.get(codec.seq2bit(b"AAAAAAAAAAA"))


def test_device_words_layout():
    s = SolidSet.from_sequences([SEQ], 11)
    words = s.device_words()
    for kmer in codec.tokenize(SEQ, 11):
        idx = codec.canonical(kmer, 11) >> 1
        assert (int(words[idx >> 5]) >> (idx & 31)) & 1


def test_hash_device_table():
    h = HashSet.from_sequences([SEQ], 11)
    table = h.device_table()
    assert table.size >= len(h)
    assert np.all(np.diff(table.astype(np.int64)) >= 0)
    for kmer in codec.tokenize(SEQ, 11):
        cano = codec.canonical(kmer, 11)
        pos = np.searchsorted(table, np.uint64(cano))
        assert table[pos] == cano
