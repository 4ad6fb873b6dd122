"""Queue-block-width sweep on the r5 pass structure (chip, readback-
synced, distinct real-corpus chunks as fresh inputs)."""

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
    CHUNK, R = 1 << 20, 512
    reads = [s for _d, s, _q in read_records(
        "/root/reference/tests/data/raw.fasta")]
    counter = Counter(K)
    for r in reads:
        counter.count_sequence(r)
    solid = counter.to_solid(2)
    print("device:", jax.devices()[0], flush=True)

    tc = Tpu3Corrector(solid, ["one"], 5, 7, chunk=CHUNK, nreads=R)
    plans = tc._plan(reads, set())
    unpack = tc._get_unpack()
    dev = [(unpack(jax.device_put(a)), jax.device_put(rs),
            jax.device_put(rl))
           for a, rs, rl in (tc._chunk_arrays(reads, i, s)
                             for i, s in plans)]

    strats = ("one", "two", "greedy")
    for strat in strats:
        for blk in (2048, 4096, 8192, 16384):
            fn = make_pass3_fn(K, strat, 5, 7, 5, CHUNK, R, blk=blk)
            t0 = time.perf_counter()
            fn.lower(tc.table, *dev[0]).compile()
            tcmp = time.perf_counter() - t0
            # warm (absorbs any backpressure)
            out = fn(tc.table, *dev[0])
            np.asarray(out[2])
            t0 = time.perf_counter()
            for rep in range(2):
                for d in dev:
                    out = fn(tc.table, *d)
                    np.asarray(out[2])
            dt = (time.perf_counter() - t0) / (2 * len(dev))
            print(f"{strat:8s} blk={blk:6d} compile {tcmp:5.1f}s "
                  f"synced {dt*1000:7.1f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
