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
