"""Profile the v3 engine per-pass on the real corpus (TPU).

Times: host packing, each strategy program per chunk (synced via a small
readback -- block_until_ready is a no-op on the axon backend),
reversal, readback/decode — to find where the 7 s/corpus goes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from br_tpu.correct.engine3 import Tpu3Corrector
    from br_tpu.count import Counter
    from br_tpu.io.fasta import read_records

    K = 13
    reads = [s for _d, s, _q in read_records(
        "/root/reference/tests/data/raw.fasta")]
    counter = Counter(K)
    for r in reads:
        counter.count_sequence(r)
    solid = counter.to_solid(2)

    tc = Tpu3Corrector(solid, ["one", "two", "graph", "greedy", "gap-size"],
                       confirm=5, max_search=7)
    print("device:", jax.devices()[0])
    t0 = time.perf_counter()
    tc.warmup(two_side=False)
    print(f"warmup: {time.perf_counter()-t0:.1f}s")

    impure = set()
    plans = tc._plan(reads, impure)
    print(f"chunks: {len(plans)}, impure: {len(impure)}")

    # host packing cost
    t0 = time.perf_counter()
    arrs = [tc._chunk_arrays(reads, idxs, starts) for idxs, starts in plans]
    t_pack = time.perf_counter() - t0
    print(f"host pack: {t_pack*1000:.1f} ms total "
          f"({t_pack/len(plans)*1000:.1f} ms/chunk)")

    rev = tc._get_reverse()
    strategies = tc.corrections
    unpack = tc._get_unpack()
    dev = [(unpack(jax.device_put(a)), jax.device_put(rs),
            jax.device_put(rl)) for a, rs, rl in arrs]

    # per-strategy timing, first forward chain (chunk by chunk, synced)
    per = {s: 0.0 for s in strategies}
    per["rev"] = 0.0
    aux_tot = {s: np.zeros(8, np.int64) for s in strategies}
    state = []
    for a, rs, n in dev:
        cur_a, cur_n = a, n
        for s in strategies:
            fn = tc._get_pass(s)
            t0 = time.perf_counter()
            cur_a, cur_n, cap, aux = fn(tc.table, cur_a, rs, cur_n)[:4]
            np.asarray(cap)  # the only reliable barrier on this backend
            per[s] += time.perf_counter() - t0
            aux_tot[s] += np.asarray(aux).astype(np.int64)
        t0 = time.perf_counter()
        cur_a = rev(cur_a, rs, cur_n)
        np.asarray(cur_a[:1])
        per["rev"] += time.perf_counter() - t0
        state.append((cur_a, rs, cur_n))

    print("\nforward chain, per strategy (all chunks, synced):")
    for s in strategies:
        au = aux_tot[s]
        print(f"  {s:10s} {per[s]*1000:8.1f} ms   sites={au[0]:6d} "
              f"visited={au[4]:6d} applied={au[5]:6d} capped_reads={au[6]}")
    print(f"  {'rev':10s} {per['rev']*1000:8.1f} ms")

    # second pass (reverse direction) quick total
    t0 = time.perf_counter()
    outs = []
    for cur_a, rs, cur_n in state:
        for s in strategies:
            fn = tc._get_pass(s)
            cur_a, cur_n, cap, aux = fn(tc.table, cur_a, rs, cur_n)[:4]
        cur_a = rev(cur_a, rs, cur_n)
        outs.append((cur_a, cur_n, cap))
    for a, n, c in outs:
        np.asarray(c)
    t_rev_chain = time.perf_counter() - t0
    print(f"\nreverse-direction chain total (async pipelined): "
          f"{t_rev_chain*1000:.1f} ms")

    # readback
    t0 = time.perf_counter()
    for a, n, c in outs:
        np.asarray(a), np.asarray(n), np.asarray(c)
    t_rb = time.perf_counter() - t0
    print(f"readback: {t_rb*1000:.1f} ms")

    # end-to-end steady state like bench
    for rep in range(3):
        t0 = time.perf_counter()
        out = tc.correct_batch(reads, two_side=False)
        t = time.perf_counter() - t0
        print(f"correct_batch rep{rep}: {t:.3f}s -> {206/t:.1f} reads/s")


if __name__ == "__main__":
    main()
