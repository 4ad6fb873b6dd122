"""Native C++ engine vs oracle: catalog + chain equivalence."""

import numpy as np
import pytest

from catalog import CASES, NO_REFE_CHECK, build_case_set, build_oracle_corrector, filt


def _native(s, method, kwargs, threads=2):
    from br_tpu.native import NativeCorrector

    c = kwargs.get("c", kwargs.get("nb_validate", 2))
    ms = kwargs.get("max_search", 7)
    return NativeCorrector(s, [method], c, ms, threads=threads)


@pytest.mark.parametrize(
    "name,method,kwargs,k,refe,read,extra,expect",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_native_catalog(name, method, kwargs, k, refe, read, extra, expect):
    refe_f, read_f = filt(refe), filt(read)
    s = build_case_set(k, refe_f, extra)
    oracle = build_oracle_corrector(method, kwargs, s)
    nc = _native(s, method, kwargs)
    # two_side=True == a single forward chain == Corrector::correct
    inputs = [read_f] + ([] if name in NO_REFE_CHECK else [refe_f])
    got = nc.correct_batch(inputs, two_side=True)
    want = [oracle.correct(x) for x in inputs]
    assert got == want


def test_native_full_chain_and_reverse_pass():
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.native import NativeCorrector
    from br_tpu.set.solid import SolidSet

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACTG", np.uint8)
    genome = rng.choice(bases, 2000).astype(np.uint8).tobytes()
    s = SolidSet.from_sequences([genome], 11)
    reads = []
    for _ in range(16):
        st = int(rng.integers(0, len(genome) - 150))
        read = bytearray(genome[st : st + 150])
        read[60] = int(rng.choice(bases))
        reads.append(bytes(read))

    chain = ["one", "two", "graph", "greedy", "gap-size"]
    nc = NativeCorrector(s, chain, 5, 7)
    methods = build_methods(chain, s, 5, 7)
    for two_side in (False, True):
        got = nc.correct_batch(reads, two_side)
        want = [correct_read(r, methods, two_side) for r in reads]
        assert got == want


def test_native_hash_backend():
    from br_tpu.correct import reference as R
    from br_tpu.native import NativeCorrector
    from br_tpu.set.hash import HashSet

    refe = b"GTGTGACTTACACCTCGTTGAGCACCCGATGTTGGTATAGTCCGAACAAC"
    read = bytearray(refe)
    read[25] = ord(b"T")
    read = bytes(read)
    h = HashSet.from_sequences([refe], 11)
    nc = NativeCorrector(h, ["one"], 2, 7)
    oracle = R.One(h, 2)
    assert nc.correct_batch([read], True) == [oracle.correct(read)]
