"""Corpus-level cross-backend equality on the real reference data (slow)."""

import pytest

REF_FASTA = "/root/reference/tests/data/raw.fasta"
REF_SOLID = "/root/reference/tests/data/raw.k11.a2.solid"


def _reads(limit=None):
    from br_tpu.io.fasta import read_records

    out = [seq for _d, seq, _q in read_records(REF_FASTA)]
    return out[:limit] if limit else out


@pytest.mark.slow
def test_backends_agree_on_corpus_subset():
    """jax engine == native engine == scalar oracle on real reads,
    full default chain, k=11 bundled solid set."""
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.correct.engine3 import Tpu3Corrector
    from br_tpu.native import NativeCorrector
    from br_tpu.set.solid import SolidSet

    solid = SolidSet.load(REF_SOLID)
    chain = ["one", "two", "graph", "greedy", "gap-size"]
    reads = _reads(limit=8)

    nc = NativeCorrector(solid, chain, 5, 7)
    tc = Tpu3Corrector(solid, chain, 5, 7, chunk=1 << 15, nreads=8)
    native = nc.correct_batch(reads, two_side=False)
    device = tc.correct_batch(reads, two_side=False)
    assert device == native

    methods = build_methods(chain, solid, 5, 7)
    oracle = [correct_read(r, methods, False) for r in reads[:2]]
    assert native[:2] == oracle


@pytest.mark.slow
def test_native_matches_oracle_full_corpus_one():
    """Single-strategy One over the whole corpus, native vs oracle."""
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.native import NativeCorrector
    from br_tpu.set.solid import SolidSet

    solid = SolidSet.load(REF_SOLID)
    reads = _reads(limit=40)
    nc = NativeCorrector(solid, ["one"], 5, 7)
    methods = build_methods(["one"], solid, 5, 7)
    got = nc.correct_batch(reads, two_side=False)
    want = [correct_read(r, methods, False) for r in reads]
    assert got == want
