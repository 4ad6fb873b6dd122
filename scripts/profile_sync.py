"""Trustworthy v3 pass timing: sync via np.asarray readback (the axon
backend's block_until_ready is a NO-OP — scripts/compile_scaling.py showed
0.1 ms/chunk 'synced' runs; only data fetch truly waits)."""

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

    for LOG in (18, 20):
        CHUNK, R = 1 << LOG, 256
        tc = Tpu3Corrector(solid, ["one", "greedy"], 5, 7,
                           chunk=CHUNK, nreads=R)
        plans = tc._plan(reads, set())
        unpack = tc._get_unpack()
        dev = [(unpack(jax.device_put(a)), jax.device_put(rs),
                jax.device_put(rl))
               for a, rs, rl in (tc._chunk_arrays(reads, i, s)
                                 for i, s in plans)]
        print(f"\nCHUNK=2^{LOG}: {len(plans)} chunks", flush=True)

        for strat in ("one", "greedy"):
            fn = make_pass3_fn(K, strat, 5, 7, 5, CHUNK, R)
            t0 = time.perf_counter()
            fn.lower(tc.table, *dev[0]).compile()
            print(f"  {strat:8s} compile {time.perf_counter()-t0:6.1f}s",
                  flush=True)
            # warm + flush queue
            out = fn(tc.table, *dev[0])
            np.asarray(out[1])

            # timed: dispatch each chunk, readback out_lens (1 KB) to sync
            t0 = time.perf_counter()
            for d in dev:
                out = fn(tc.table, *d)
                np.asarray(out[1])
            dt = time.perf_counter() - t0
            print(f"  {strat:8s} run {dt*1000:7.1f} ms total "
                  f"({dt/len(dev)*1000:6.1f} ms/chunk, "
                  f"{dt*1000/(len(dev)*(1 << (LOG-18))):6.1f} ms per 2^18 "
                  f"of data)", flush=True)


if __name__ == "__main__":
    main()
