"""TPU engine vs oracle: bit-exactness of the batched device path.

Quick tier (always): one compile per strategy at a shared bucket shape,
covering a representative catalog slice + the batch/assembly plumbing.
Slow tier (-m slow): the full ported catalog, fuzzed corpora, and the
engineered-bound equivalence notes.

On the MAX_WALK ring guard: the reference declines a Graph/GapSize walk at
the first k-mer revisit (graph.rs:71-75).  In a unique-successor walk a
revisit implies a pure cycle, so the walk can never reach the target
afterwards; our RING-recent guard plus the MAX_WALK cap therefore declines
exactly when the reference does, except that a genuine path longer than
MAX_WALK raises cap_hit and the read is re-corrected by the native engine
(observed cap rate on the bundled corpus: see test_corpus.py).
"""

import numpy as np
import pytest

from catalog import CASES, NO_REFE_CHECK, build_case_set, build_oracle_corrector, filt

import jax

from br_tpu.correct.engine import TpuCorrector, _emit_words, make_pass_fn

L_SHARED = 80  # all catalog cases fit; one compile per strategy

_fn_cache = {}


def _engine_correct_many(s, method, kwargs, seqs):
    k = s.k
    c = kwargs.get("c", kwargs.get("nb_validate", 2))
    ms = kwargs.get("max_search", 7)
    E = max(_emit_words(method) * (L_SHARED // 4 + 16), 64)
    key = (k, method, c, ms)
    fn = _fn_cache.get(key)
    if fn is None:
        fn = make_pass_fn(k, method, c, ms, c, L_SHARED, E, "solid")
        _fn_cache[key] = fn
    B = len(seqs)
    a = np.zeros((B, L_SHARED), np.uint8)
    n = np.zeros(B, np.int32)
    for b, seq in enumerate(seqs):
        a[b, : len(seq)] = np.frombuffer(seq, np.uint8)
        n[b] = len(seq)
    out, onl, cap = fn(jax.device_put(s.device_words()), a, n)
    assert not np.asarray(cap).any()
    out, onl = np.asarray(out), np.asarray(onl)
    return [out[b, : onl[b]].tobytes() for b in range(B)]


QUICK = [c for c in CASES if c[0] in {
    "one_csc", "one_cic", "one_cdc", "one_cssc",
    "two_ciic", "two_cssc", "two_cdcdc",
    "graph_csc", "graph_branching_csc", "graph_cddc",
    "gap_csc", "gap_cscsc", "gap_cic",
    "greedy_csc", "greedy_ciic",
}]


def _run_cases(cases):
    by_cfg = {}
    for case in cases:
        (name, method, kwargs, k, refe, read, extra, expect) = case
        by_cfg.setdefault((method, k, tuple(sorted(kwargs.items()))),
                          []).append(case)
    for (_method, _k, _kw), group in by_cfg.items():
        for (name, method, kwargs, k, refe, read, extra, expect) in group:
            refe_f, read_f = filt(refe), filt(read)
            s = build_case_set(k, refe_f, extra)
            oracle = build_oracle_corrector(method, kwargs, s)
            inputs = [read_f] + ([] if name in NO_REFE_CHECK else [refe_f])
            want = [oracle.correct(x) for x in inputs]
            got = _engine_correct_many(s, method, kwargs, inputs)
            assert got == want, f"{name}: engine diverges from oracle"


def test_engine_quick_catalog():
    _run_cases(QUICK)


@pytest.mark.slow
def test_engine_full_catalog():
    _run_cases(CASES)


def test_engine_batched_chain_matches_oracle():
    """Full 5-method chain + reverse pass through TpuCorrector on a small
    planted-error batch, vs the scalar oracle."""
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.set.solid import SolidSet

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACTG", np.uint8)
    genome = rng.choice(bases, 1500).astype(np.uint8).tobytes()
    k = 9
    s = SolidSet.from_sequences([genome], k)

    reads = []
    for _ in range(10):
        st = int(rng.integers(0, len(genome) - 120))
        read = bytearray(genome[st : st + 120])
        read[40] = int(rng.choice(bases))
        reads.append(bytes(read))
    reads.append(b"ACT")  # shorter than k: passthrough
    reads.append(genome[:70])  # clean read

    chain = ["one", "two", "graph", "greedy", "gap-size"]
    tc = TpuCorrector(s, chain, confirm=5, max_search=7)
    methods = build_methods(chain, s, 5, 7)
    for two_side in (False, True):
        got = tc.correct_batch(reads, two_side)
        want = [correct_read(r, methods, two_side) for r in reads]
        assert got == want


@pytest.mark.slow
def test_engine_fuzz():
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.set.solid import SolidSet

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACTG", np.uint8)

    def plant(read, rate):
        out = bytearray()
        for ch in read:
            r = rng.random()
            if r < rate / 3:
                continue
            if r < 2 * rate / 3:
                out.append(int(rng.choice(bases)))
                continue
            if r < rate:
                out.append(ch)
                out.append(int(rng.choice(bases)))
                continue
            out.append(ch)
        return bytes(out)

    genome = rng.choice(bases, 4000).astype(np.uint8).tobytes()
    k = 13
    s = SolidSet.from_sequences([genome], k)
    reads = []
    for _ in range(12):
        st = int(rng.integers(0, len(genome) - 250))
        reads.append(plant(genome[st : st + 250], 0.05))

    chain = ["one", "two", "graph", "greedy", "gap-size"]
    tc = TpuCorrector(s, chain, confirm=5, max_search=7)
    methods = build_methods(chain, s, 5, 7)
    got = tc.correct_batch(reads, two_side=False)
    want = [correct_read(r, methods, False) for r in reads]
    assert got == want
