"""Golden corrected outputs for the bundled corpus (SURVEY §4 tier 2).

The goldens (tests/golden/*.txt.gz, one corrected sequence per line) pin
the agreed semantics of the native C++ engine and the scalar oracle on
the reference corpus — regenerate with scripts/make_goldens.py, which
re-asserts native/oracle agreement before writing.  The reference's own
integration tests check only exit codes (tests/br.rs:28-30); these are
stricter: any semantics drift in any backend fails against pinned bytes.
"""

import gzip
import hashlib
import json
import os

import pytest

from br_tpu.correct import build_methods, correct_read
from br_tpu.io.fasta import read_records
from br_tpu.set.solid import SolidSet

REF = "/root/reference/tests/data"
GOLD = os.path.join(os.path.dirname(__file__), "golden")
CHAIN = ["one", "two", "graph", "greedy", "gap-size"]


def _load(name):
    with gzip.open(f"{GOLD}/{name}.txt.gz", "rb") as fh:
        return fh.read().splitlines()


def _index():
    with open(f"{GOLD}/index.json") as fh:
        return json.load(fh)


def _reads():
    return [s for _d, s, _q in read_records(f"{REF}/raw.fasta")]


def _configs():
    out = {}
    solid11 = SolidSet.load(f"{REF}/raw.k11.a2.solid")
    out["k11.solid"] = solid11
    return out


def test_index_matches_files():
    idx = _index()
    assert len(idx) == 13
    for name, meta in idx.items():
        lines = _load(name)
        blob = b"".join(s + b"\n" for s in lines)
        assert hashlib.sha256(blob).hexdigest() == meta["sha256"], name
        assert len(lines) == meta["n_reads"] == 206


@pytest.mark.parametrize("name,methods,two_side", [
    ("k11.solid.one", ["one"], False),
    ("k11.solid.chain", CHAIN, False),
    ("k11.solid.chain.two-side", CHAIN, True),
])
def test_native_matches_golden(name, methods, two_side):
    native = pytest.importorskip("br_tpu.native")
    solid = SolidSet.load(f"{REF}/raw.k11.a2.solid")
    nc = native.NativeCorrector(solid, methods, 5, 7)
    got = nc.correct_batch(_reads(), two_side=two_side)
    assert got == _load(name)


def test_oracle_matches_golden_sample():
    solid = SolidSet.load(f"{REF}/raw.k11.a2.solid")
    methods = build_methods(CHAIN, solid, 5, 7)
    want = _load("k11.solid.chain")
    reads = _reads()
    for i in range(0, len(reads), 37):
        assert correct_read(reads[i], methods, False) == want[i], i


def test_jax_production_corpus_subset():
    """DEFAULT tier (VERDICT r3 item 2): the production device path must
    be bit-exact vs the pinned golden on a subset of the REAL corpus.

    Random-genome fuzz passed while the round-3 fused-ladder regression
    mismatched 31/206 corpus reads — real reads have the repeat/ambiguity
    structure that distinguishes execution plans, so the corpus itself
    has to gate `pytest -q`.  Runtime-budgeted: k=13 / CHUNK=1<<14 / R=32
    shares the _FN_CACHE key with tests/test_engine3.py's fuzz, so when
    the whole suite runs the programs are already compiled and this test
    only pays run time on ~40 reads.
    """
    from br_tpu.correct.engine3 import Tpu3Corrector
    from br_tpu.count import Counter

    reads = _reads()
    counter = Counter(13)
    counter.count_sequences(reads)
    solid = counter.to_solid(2)
    want = _load("k13.a2.chain")

    subset = [i for i, r in enumerate(reads) if len(r) < 6000][:40]
    assert len(subset) >= 35
    tc = Tpu3Corrector(solid, CHAIN, 5, 7, chunk=1 << 14, nreads=32)
    got = tc.correct_batch([reads[i] for i in subset], two_side=False)
    for j, i in enumerate(subset):
        assert got[j] == want[i], f"read {i} diverges from golden"


@pytest.mark.slow
def test_native_matches_golden_all():
    from br_tpu.count import Counter
    from br_tpu.native import NativeCorrector

    reads = _reads()
    counter = Counter(13)
    for r in reads:
        counter.count_sequence(r)
    solids = {"k11.solid": SolidSet.load(f"{REF}/raw.k11.a2.solid"),
              "k13.a2": counter.to_solid(2)}
    for name in _index():
        base, _, tail = name.rpartition(".")
        if tail == "two-side":
            continue  # covered in the default tier
        mode, _, strat = name.rpartition(".")
        methods = CHAIN if strat == "chain" else [strat]
        nc = NativeCorrector(solids[mode], methods, 5, 7)
        assert nc.correct_batch(reads, two_side=False) == _load(name), name


@pytest.mark.slow
def test_jax_engine_matches_golden_chain():
    """The flagship v3 device engine vs the pinned full-chain golden."""
    from br_tpu.runtime import make_corrector

    solid = SolidSet.load(f"{REF}/raw.k11.a2.solid")
    tc = make_corrector(solid, CHAIN, 5, 7, backend="jax")
    got = tc.correct_batch(_reads(), two_side=False)
    assert got == _load("k11.solid.chain")
