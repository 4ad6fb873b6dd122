"""Differential tests: the v2 (site-parallel) engine vs the scalar oracle.

Same ground rules as test_engine.py: the oracle (br_tpu.correct.reference)
is the spec; engine2 must match byte-for-byte, falling back through its
cap flags where its engineered bounds bite (the fallback path itself goes
through the oracle, so any mismatch here is a real engine bug).
"""

import numpy as np
import pytest

from br_tpu.correct import build_methods, correct_read
from br_tpu.correct.engine2 import Tpu2Corrector
from br_tpu.set.solid import SolidSet

K = 13
FULL = ["one", "two", "graph", "greedy", "gap-size"]


def _fuzz_case(chain, seed, n_reads=16, err=3, two_side=True,
               nul_heavy=False):
    rng = np.random.default_rng(seed)
    if nul_heavy:
        genome = bytes(rng.choice(list(b"ACTG"), size=4000))
    else:
        genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                            size=4000).tobytes()
    solid = SolidSet.from_sequences([genome], K)
    reads = []
    for _ in range(n_reads):
        lo = rng.integers(0, 3600)
        ln = int(rng.integers(2 * K + 10, 400))
        r = bytearray(genome[lo : lo + ln])
        for _ in range(err):
            p = rng.integers(K + 2, len(r) - K - 2)
            op = rng.integers(3)
            if op == 0:
                r[p] = ord("ACTG"[rng.integers(4)])
            elif op == 1 and len(r) > 2 * K + 8:
                del r[p]
            else:
                r.insert(p, ord("ACTG"[rng.integers(4)]))
        reads.append(bytes(r))

    tc = Tpu2Corrector(solid, chain, confirm=5, max_search=7)
    tc.TARGET_ELEMS = 1 << 15
    got = tc.correct_batch(reads, two_side)
    methods = build_methods(chain, solid, 5, 7)
    want = [correct_read(r, methods, two_side) for r in reads]
    assert got == want


def test_v2_one_chain():
    _fuzz_case(["one"], seed=11)


@pytest.mark.slow
@pytest.mark.parametrize("chain", [["two"], ["graph"], ["greedy"],
                                   ["gap-size"], FULL])
def test_v2_single_strategies(chain):
    _fuzz_case(chain, seed=42)


@pytest.mark.slow
def test_v2_full_chain_reverse_pass():
    _fuzz_case(FULL, seed=9, err=6, two_side=False)


@pytest.mark.slow
def test_v2_nul_heavy_bytes():
    # regression: greedy's acceptance alignment must compare raw bytes
    # (rust-bio domain), not 2-bit codes
    _fuzz_case(["greedy"], seed=42, nul_heavy=True)
    _fuzz_case(FULL, seed=9, err=6, two_side=False, nul_heavy=True)


# ---------------------------------------------------------------------------
# Large-k (19-31) device path: Tpu2Corrector + HashSet (VERDICT r4 item
# 5).  Reference bar: src/set/hash.rs:14-17 + correct/mod.rs:26-42 cover
# k <= 31 via the FxHashSet backend; our device analog is the sorted-u64
# binary-search probe (set/hash.py, device_codec.make_hash_probe_any).
# ---------------------------------------------------------------------------


def _fuzz_case_hash(chain, k, seed, n_reads=12, err=3, two_side=True):
    from br_tpu.set.hash import HashSet

    rng = np.random.default_rng(seed)
    genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=6000).tobytes()
    hset = HashSet.from_sequences([genome], k)
    reads = []
    for _ in range(n_reads):
        lo = rng.integers(0, 5000)
        ln = int(rng.integers(2 * k + 10, 600))
        r = bytearray(genome[lo : lo + ln])
        for _ in range(err):
            p = rng.integers(k + 2, len(r) - k - 2)
            op = rng.integers(3)
            if op == 0:
                r[p] = ord("ACTG"[rng.integers(4)])
            elif op == 1 and len(r) > 2 * k + 8:
                del r[p]
            else:
                r.insert(p, ord("ACTG"[rng.integers(4)]))
        reads.append(bytes(r))

    tc = Tpu2Corrector(hset, chain, confirm=5, max_search=7)
    tc.TARGET_ELEMS = 1 << 15
    got = tc.correct_batch(reads, two_side)
    methods = build_methods(chain, hset, 5, 7)
    want = [correct_read(r, methods, two_side) for r in reads]
    assert got == want, (chain, k)


def test_v2_hashset_k21_default_chain():
    """DEFAULT tier: k=21 full cascade on the device hash-probe path."""
    _fuzz_case_hash(FULL, k=21, seed=2121, two_side=False)


def test_v2_hashset_k21_one_chain_two_side():
    _fuzz_case_hash(["one"], k=21, seed=77)


@pytest.mark.slow
@pytest.mark.parametrize("k", [19, 25, 31])
def test_v2_hashset_large_k_sweep(k):
    """k sweep to the reference's ceiling (hash.rs k <= 31)."""
    _fuzz_case_hash(FULL, k=k, seed=1000 + k, two_side=False)
