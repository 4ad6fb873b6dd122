"""Stage bisect of the v3 pass on real corpus chunks (TPU): dense-only vs
dense+queue vs full, for 'one' and 'greedy', synced via readback."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax


def main():
    from br_tpu.correct.engine3 import Tpu3Corrector, make_pass3_fn
    from br_tpu.count import Counter
    from br_tpu.io.fasta import read_records

    import os
    K = 13
    CHUNK = 1 << int(os.environ.get("BISECT_CHUNK_LOG2", "18"))
    R = 256
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

    def to_dev(arrs):
        packed, rstart, rlen = arrs
        return (unpack(jax.device_put(packed)), jax.device_put(rstart),
                jax.device_put(rlen))

    dev = [to_dev(tc._chunk_arrays(reads, i, s)) for i, s in plans]

    import os
    strats = os.environ.get("BISECT_STRATS", "one,greedy").split(",")
    for strat in strats:
        for cut in ("dense", "queue", None):
            fn = make_pass3_fn(K, strat, 5, 7, 5, CHUNK, R, _cut=cut)
            t0 = time.perf_counter()
            fn.lower(tc.table, *dev[0]).compile()
            tcmp = time.perf_counter() - t0
            out = fn(tc.table, *dev[0])
            np.asarray(out[1])
            t0 = time.perf_counter()
            for d in dev:
                out = fn(tc.table, *d)
                np.asarray(out[1])
            dt = (time.perf_counter() - t0) / len(dev)
            print(f"{strat:8s} cut={str(cut):6s} compile {tcmp:5.1f}s "
                  f"run {dt*1000:7.1f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
