"""Quick differential smoke test of engine3 vs the scalar oracle (CPU)."""

import faulthandler, os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, "/root/repo")

import numpy as np
faulthandler.dump_traceback_later(1500, exit=True)

from br_tpu.correct import build_methods, correct_read
from br_tpu.correct.engine3 import Tpu3Corrector
from br_tpu.set.solid import SolidSet

K = 13
FULL = ["one", "two", "graph", "greedy", "gap-size"]


def fuzz(chain, seed, n_reads=16, err=3, two_side=True):
    rng = np.random.default_rng(seed)
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

    tc = Tpu3Corrector(solid, chain, confirm=5, max_search=7,
                       chunk=1 << 14, nreads=32)
    got = tc.correct_batch(reads, two_side)
    methods = build_methods(chain, solid, 5, 7)
    want = [correct_read(r, methods, two_side) for r in reads]
    nbad = sum(1 for a, b in zip(got, want) if a != b)
    print(f"chain={chain} seed={seed} two_side={two_side}: "
          f"{len(reads)-nbad}/{len(reads)} match", flush=True)
    if nbad:
        for j, (a, b) in enumerate(zip(got, want)):
            if a != b:
                print(f"  read {j}: in={reads[j][:60]}...")
                print(f"    got ={a[:80]}")
                print(f"    want={b[:80]}")
                if j > 3:
                    break
    return nbad == 0


if __name__ == "__main__":
    ok = True
    for chain in (["one"], ["two"], ["graph"], ["greedy"], ["gap-size"]):
        ok &= fuzz(chain, seed=42)
    ok &= fuzz(FULL, seed=9, err=6, two_side=False)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)
