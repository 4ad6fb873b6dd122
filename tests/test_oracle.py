"""Oracle correctness: the full ported reference unit-test catalog."""

import pytest

from catalog import CASES, NO_REFE_CHECK, build_case_set, build_oracle_corrector, filt

from br_tpu import codec
from br_tpu.correct.reference import alt_nucs


@pytest.mark.parametrize(
    "name,method,kwargs,k,refe,read,extra,expect",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_case(name, method, kwargs, k, refe, read, extra, expect):
    refe, read = filt(refe), filt(read)
    s = build_case_set(k, refe, extra)
    corrector = build_oracle_corrector(method, kwargs, s)

    expected = refe if expect == "refe" else read
    assert corrector.correct(read) == expected

    if name not in NO_REFE_CHECK:
        assert corrector.correct(refe) == refe


def test_found_alt_kmer():
    """reference src/correct/mod.rs:170-181."""
    from br_tpu.set.solid import SolidSet

    s = SolidSet(5)
    s.set(codec.seq2bit(b"ACTGA"), True)
    s.set(codec.seq2bit(b"ACTGT"), True)
    assert alt_nucs(s, codec.seq2bit(b"ACTGC")) == [0, 2]


def test_short_read_passthrough():
    """Reads shorter than k are returned unchanged (mod.rs:56-58)."""
    s = build_case_set(5, b"ACTGACGAC", [])
    corrector = build_oracle_corrector("one", {"c": 2}, s)
    assert corrector.correct(b"ACT") == b"ACT"


def test_two_side_reverse_pass():
    """The chain reruns on PLAIN-reversed bytes (not reverse-complemented)
    when --two-side is absent (src/lib.rs:110-117).  An error inside the
    first k bases is only fixable by the reverse pass, and only when the
    *plain-reversed* k-mers are themselves in the set — which proves the
    pass reverses without complementing."""
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.set.solid import SolidSet

    refe = b"ACTGACGACCCTTGCA"
    read = bytearray(refe)
    read[3] = ord(b"T")  # substitution at position 3 (< k)
    read = bytes(read)

    s = SolidSet(5)
    for seq in (refe, refe[::-1]):
        for kmer in codec.tokenize(seq, 5):
            s.set(kmer, True)

    methods = build_methods(["one"], s, 2, 7)
    assert correct_read(read, methods, two_side=True) == read
    assert correct_read(read, methods, two_side=False) == refe
