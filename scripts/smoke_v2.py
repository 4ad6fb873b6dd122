"""Smoke-test engine2 vs the scalar oracle on small fuzzed inputs."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from br_tpu.correct import build_methods, correct_read
from br_tpu.correct.engine2 import Tpu2Corrector
from br_tpu.set.solid import SolidSet

K = 13
rng = np.random.default_rng(0)


NUL_HEAVY = False


def random_genome(n):
    if NUL_HEAVY:
        # int64 choice -> bytes() gives NUL-padded little-endian bytes;
        # keep as a regression alphabet (caught the greedy byte-vs-code
        # alignment bug).
        return bytes(rng.choice(list(b"ACTG"), size=n))
    return rng.choice(np.frombuffer(b"ACTG", np.uint8), size=n).tobytes()


def mutate(read, nerr):
    b = bytearray(read)
    for _ in range(nerr):
        p = rng.integers(K + 2, len(b) - K - 2)
        op = rng.integers(3)
        if op == 0:
            b[p] = ord("ACTG"[rng.integers(4)])
        elif op == 1 and len(b) > 2 * K + 8:
            del b[p]
        else:
            b.insert(p, ord("ACTG"[rng.integers(4)]))
    return bytes(b)


def run_case(chain, genome_len, n_reads, err_per_read, two_side, seed):
    global rng
    rng = np.random.default_rng(seed)
    genome = random_genome(genome_len)
    solid = SolidSet.from_sequences([genome], K)
    reads = []
    for _ in range(n_reads):
        lo = rng.integers(0, max(1, genome_len - 400))
        ln = int(rng.integers(2 * K + 10, 400))
        r = genome[lo : lo + ln]
        if len(r) < K:
            continue
        reads.append(mutate(r, err_per_read))

    tc = Tpu2Corrector(solid, chain, confirm=5, max_search=7)
    tc.TARGET_ELEMS = 1 << 15  # small buckets: fast compiles for testing
    methods = build_methods(chain, solid, 5, 7)
    got = tc.correct_batch(reads, two_side)
    n_bad = 0
    for i, (r, g) in enumerate(zip(reads, got)):
        want = correct_read(r, methods, two_side)
        if g != want:
            n_bad += 1
            if n_bad <= 3:
                print(f"  MISMATCH read {i}: len_in={len(r)} "
                      f"got={len(g)} want={len(want)}")
                print(f"   in  : {r[:90]!r}")
                print(f"   got : {g[:90]!r}")
                print(f"   want: {want[:90]!r}")
    tag = "OK " if n_bad == 0 else "BAD"
    print(f"{tag} chain={chain} glen={genome_len} reads={len(reads)} "
          f"err={err_per_read} two_side={two_side} mism={n_bad}")
    return n_bad


def main():
    global NUL_HEAVY
    bad = 0
    for chain in (["one"], ["two"], ["graph"], ["greedy"], ["gap-size"],
                  ["one", "two", "graph", "greedy", "gap-size"]):
        bad += run_case(chain, 4000, 24, 3, True, seed=42)
    bad += run_case(["one"], 4000, 24, 3, False, seed=7)
    bad += run_case(["one", "two", "graph", "greedy", "gap-size"],
                    4000, 24, 6, False, seed=9)
    NUL_HEAVY = True
    bad += run_case(["greedy"], 4000, 24, 3, True, seed=42)
    bad += run_case(["one", "two", "graph", "greedy", "gap-size"],
                    4000, 24, 6, False, seed=9)
    NUL_HEAVY = False
    print("TOTAL MISMATCHES:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
