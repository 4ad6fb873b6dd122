"""Reproduce the greedy divergence from smoke_v2 (seed 42, read 6)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import br_tpu.correct.reference as ref
from br_tpu import codec
from br_tpu.correct import build_methods
from br_tpu.correct.engine import TpuCorrector
from br_tpu.correct.engine2 import Tpu2Corrector
from br_tpu.set.solid import SolidSet

K = 13
rng = np.random.default_rng(42)


def random_genome(n):
    return bytes(rng.choice(list(b"ACTG"), size=n))


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


# replicate smoke run_case(["greedy"], 4000, 24, 3, True, seed=42) RNG usage:
# run_case order: genome (uses rng), then per read: lo, ln, mutate
genome = random_genome(4000)
solid = SolidSet.from_sequences([genome], K)
reads = []
for _ in range(24):
    lo = rng.integers(0, max(1, 4000 - 400))
    ln = int(rng.integers(2 * K + 10, 400))
    r = genome[lo : lo + ln]
    if len(r) >= K:
        reads.append(mutate(r, 3))

read = reads[6]
methods = build_methods(["greedy"], solid, 5, 7)

# instrument the oracle: log every correct_error call of the first pass
calls = []
orig = ref.Greedy.correct_error


def logged(self, kmer, seq):
    res = orig(self, kmer, seq)
    calls.append((len(seq), kmer, res))
    return res


ref.Greedy.correct_error = logged
want_fwd = methods[0].correct(read)
ref.Greedy.correct_error = orig

print(f"read len={len(read)} oracle fwd len={len(want_fwd)}")
for lseq, kmer, res in calls:
    i = len(read) - lseq
    print(f"  oracle attempt @i={i} kmer={kmer:026b} -> {res}")

# v1 engine (bit-exact reference impl on device)
t1 = TpuCorrector(solid, ["greedy"], confirm=5, max_search=7)
t1.TARGET_ELEMS = 1 << 15
v1 = t1.correct_batch([read], two_side=True)[0]
print("v1 == oracle:", v1 == want_fwd)

t2 = Tpu2Corrector(solid, ["greedy"], confirm=5, max_search=7)
t2.TARGET_ELEMS = 1 << 15
v2 = t2.correct_batch([read], two_side=True)[0]
print("v2 == oracle:", v2 == want_fwd)
if v2 != want_fwd:
    d = next((j for j in range(min(len(v2), len(want_fwd)))
              if v2[j] != want_fwd[j]), min(len(v2), len(want_fwd)))
    print(f"first diff at out pos {d}")
    print("  want:", want_fwd[max(0, d - 10): d + 20])
    print("  got :", v2[max(0, d - 10): d + 20])
