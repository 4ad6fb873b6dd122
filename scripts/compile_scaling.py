"""Compile-time + runtime scaling of the v3 pass with CHUNK size (TPU).

Decides the chunk-size architecture: bigger chunks amortize per-op latency
(scans ~1 ms each regardless of size) but XLA compile time grows with the
static shape.  Times pass 'one' (cheapest) and 'greedy' (dearest) at
several CHUNK sizes on real corpus data, properly synced per-array.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax


def main():
    from br_tpu.correct.engine3 import Tpu3Corrector, make_pass3_fn
    from br_tpu.count import Counter
    from br_tpu.io.fasta import read_records

    K = 13
    reads = [s for _d, s, _q in read_records(
        "/root/reference/tests/data/raw.fasta")]
    counter = Counter(K)
    for r in reads:
        counter.count_sequence(r)
    solid = counter.to_solid(2)
    print("device:", jax.devices()[0], flush=True)

    for LOG in (19, 20):
        CHUNK, R = 1 << LOG, 256
        tc = Tpu3Corrector(solid, ["one", "greedy"], 5, 7,
                           chunk=CHUNK, nreads=R)
        plans = tc._plan(reads, set())
        arrs = [tc._chunk_arrays(reads, i, s) for i, s in plans]
        unpack = tc._get_unpack()
        dev = [(unpack(jax.device_put(a)), jax.device_put(rs),
                jax.device_put(rl)) for a, rs, rl in arrs]
        print(f"\nCHUNK=2^{LOG}: {len(plans)} chunks", flush=True)

        for strat in ("one", "greedy"):
            fn = make_pass3_fn(K, strat, 5, 7, 5, CHUNK, R)
            t0 = time.perf_counter()
            low = fn.lower(tc.table, *dev[0])
            t1 = time.perf_counter()
            low.compile()
            t2 = time.perf_counter()
            print(f"  {strat:8s} lower {t1-t0:5.1f}s compile {t2-t1:6.1f}s",
                  flush=True)
            # runtime: synced per chunk over all real chunks
            outs = fn(tc.table, *dev[0])
            np.asarray(outs[1])
            t0 = time.perf_counter()
            for d in dev:
                outs = fn(tc.table, *d)
                np.asarray(outs[1])
            dt = time.perf_counter() - t0
            print(f"  {strat:8s} run {dt*1000:7.1f} ms total "
                  f"({dt/len(dev)*1000:.1f} ms/chunk, "
                  f"{dt/len(dev)/ (CHUNK/(1<<18)) *1000:.1f} ms per 2^18)",
                  flush=True)


if __name__ == "__main__":
    main()
