"""Per-dispatch cost of the v3 pass with FRESH inputs per call (the axon
relay memoizes identical dispatches — scripts/profile_v3_stages.py's 0.04 ms
readings are cache hits, not compute)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from br_tpu.correct.engine3 import Tpu3Corrector
    from br_tpu.count import Counter
    from br_tpu.io.fasta import read_records

    K = 13
    CHUNK, R = 1 << 18, 256
    reads = [s for _d, s, _q in read_records(
        "/root/reference/tests/data/raw.fasta")]
    counter = Counter(K)
    for r in reads:
        counter.count_sequence(r)
    solid = counter.to_solid(2)
    print("device:", jax.devices()[0])

    tc = Tpu3Corrector(solid, ["one"], 5, 7)
    table = tc.table
    plans = tc._plan(reads, set())
    idxs, starts = plans[0]
    packed, rstart, rlen = tc._chunk_arrays(reads, idxs, starts)

    N = 16
    rng = np.random.default_rng(0)
    fresh = []
    for i in range(N):
        p = packed.copy()
        p[rng.integers(0, len(p), 64)] ^= rng.integers(
            1, 255, 64).astype(np.uint8)
        fresh.append((jax.device_put(p), jax.device_put(rstart),
                      jax.device_put(rlen)))

    fn = tc._get_pass("one")
    print("compile...", flush=True)
    r = fn(table, *fresh[0])
    jax.block_until_ready(r)

    # (a) pipelined, fresh inputs: dispatch all, block once
    t0 = time.perf_counter()
    outs = [fn(table, *f) for f in fresh]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"fresh pipelined: {dt/N*1000:.2f} ms/dispatch ({N} calls)")

    # (b) synced per call, fresh inputs
    fresh2 = []
    for i in range(N):
        p = packed.copy()
        p[rng.integers(0, len(p), 64)] ^= rng.integers(
            1, 255, 64).astype(np.uint8)
        fresh2.append((jax.device_put(p), jax.device_put(rstart),
                       jax.device_put(rlen)))
    t0 = time.perf_counter()
    for f in fresh2:
        jax.block_until_ready(fn(table, *f))
    dt = time.perf_counter() - t0
    print(f"fresh synced:    {dt/N*1000:.2f} ms/dispatch")

    # (c) trivial program, fresh inputs — pure dispatch+transfer floor
    @jax.jit
    def triv(table, p, rs, rl):
        return p + table[0].astype(jnp.uint8), rl + 1

    jax.block_until_ready(triv(table, *fresh[0]))
    fresh3 = []
    for i in range(N):
        p = packed.copy()
        p[rng.integers(0, len(p), 64)] ^= rng.integers(
            1, 255, 64).astype(np.uint8)
        fresh3.append((jax.device_put(p), jax.device_put(rstart),
                       jax.device_put(rlen)))
    t0 = time.perf_counter()
    outs = [triv(table, *f) for f in fresh3]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"trivial fresh pipelined: {dt/N*1000:.2f} ms/dispatch")

    # (d) device_put cost for one chunk's args
    t0 = time.perf_counter()
    for i in range(N):
        jax.block_until_ready(jax.device_put(fresh[i % N][0]))
    print(f"device_put 64KB synced: "
          f"{(time.perf_counter()-t0)/N*1000:.2f} ms")


if __name__ == "__main__":
    main()
