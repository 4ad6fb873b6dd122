"""Bisect the v3 pass fixed cost: empty chunk vs loaded chunk, plus
isolated stage timings (dense precompute / splice machinery) at CHUNK=2^18.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def t(fn, *args, n=10):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else None
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


import jax
import jax.numpy as jnp


def main():
    from br_tpu.correct import device_codec as dc
    from br_tpu.correct.engine3 import Tpu3Corrector, make_pass3_fn
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
    table = jax.device_put(solid.device_words())
    print("device:", jax.devices()[0])

    tc = Tpu3Corrector(solid, ["one"], 5, 7)
    plans = tc._plan(reads, set())
    packed, rstart, rlen = tc._chunk_arrays(reads, *zip(*[
        (i, s) for i, s in zip(*plans[0])]))  # first chunk, loaded
    packed_d = jax.device_put(packed)
    rs_d = jax.device_put(rstart)
    rl_d = jax.device_put(rlen)

    empty_rs = np.full(R, CHUNK, np.int32)
    empty_rs[0] = 0
    empty = (jax.device_put(np.zeros(CHUNK // 4, np.uint8)),
             jax.device_put(empty_rs),
             jax.device_put(np.zeros(R, np.int32)))

    fn = tc._get_pass("one")
    print("compiling one...", flush=True)
    fn.lower(table, packed_d, rs_d, rl_d).compile()

    dt_empty = t(lambda: fn(table, *empty))
    dt_load = t(lambda: fn(table, packed_d, rs_d, rl_d))
    print(f"pass 'one': empty chunk {dt_empty*1000:.2f} ms, "
          f"loaded chunk {dt_load*1000:.2f} ms")

    # isolated stages
    @jax.jit
    def dense(packed_in, rstart, rlen):
        probe = dc.make_solid_probe_any(table, K)
        codes = dc.unpack_codes(packed_in, CHUNK)
        kmers = dc.rolling_kmers32(codes, K)
        pos = jnp.arange(CHUNK, dtype=jnp.int32)
        rid0 = jnp.zeros(CHUNK, jnp.int32).at[rstart].max(
            jnp.arange(R, dtype=jnp.int32), mode="drop")
        rid = jax.lax.cummax(rid0)
        start_of = rstart[rid]
        len_of = rlen[rid]
        pin = pos - start_of
        V = probe(kmers) & (pin >= K - 1) & (pin < len_of)
        Vprev = jnp.pad(V[:-1], (1, 0))
        T = Vprev & ~V & (pin >= K) & (pin < len_of)
        cumT = jnp.cumsum(T.astype(jnp.int32), dtype=jnp.int32)
        return cumT

    print(f"dense precompute alone: "
          f"{t(lambda: dense(packed_d, rs_d, rl_d))*1000:.2f} ms")

    @jax.jit
    def probe_only(packed_in):
        probe = dc.make_solid_probe_any(table, K)
        codes = dc.unpack_codes(packed_in, CHUNK)
        kmers = dc.rolling_kmers32(codes, K)
        return jnp.sum(probe(kmers))

    print(f"unpack+rolling+probe: "
          f"{t(lambda: probe_only(packed_d))*1000:.2f} ms")

    @jax.jit
    def scans_only(packed_in):
        codes = dc.unpack_codes(packed_in, CHUNK)
        x = codes.astype(jnp.int32)
        a = jnp.cumsum(x, dtype=jnp.int32)
        b = jax.lax.cummax(x)
        c = jax.lax.cummin(x[::-1])[::-1]
        return a[-1] + b[-1] + c[0]

    print(f"3 scans over CHUNK: "
          f"{t(lambda: scans_only(packed_d))*1000:.2f} ms")

    # dispatch floor: trivial jitted fn on same-sized input
    @jax.jit
    def triv(packed_in):
        return packed_in + jnp.uint8(1)

    print(f"trivial dispatch: {t(lambda: triv(packed_d))*1000:.2f} ms")


if __name__ == "__main__":
    main()
