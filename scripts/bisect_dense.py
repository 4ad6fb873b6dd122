"""Micro-bisect of the v3 dense-precompute components at CHUNK=2^18 (TPU,
fresh inputs per timed call, readback sync)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from br_tpu.correct import device_codec as dc

I32 = jnp.int32
U32 = jnp.uint32
CHUNK = 1 << 18
R = 256
K = 13
N = 8


def timed(name, fn, inputs):
    fn(*inputs[0])
    outs = [fn(*x) for x in inputs]
    for o in outs:
        np.asarray(o if not isinstance(o, tuple) else o[0])
    t0 = time.perf_counter()
    outs = [fn(*x) for x in inputs]
    for o in outs:
        np.asarray(o if not isinstance(o, tuple) else o[0])
    dt = (time.perf_counter() - t0) / len(inputs)
    print(f"{name:28s} {dt*1000:7.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    table = jax.device_put(
        rng.integers(0, 1 << 32, 1 << (2 * K - 1 - 5), dtype=np.uint32))

    packs = [jax.device_put(rng.integers(0, 256, CHUNK // 4, dtype=np.uint8))
             for _ in range(N)]
    rstart = jax.device_put(np.arange(R, dtype=np.int32) * (CHUNK // R))
    rlen = jax.device_put(np.full(R, CHUNK // R - 64, np.int32))

    probe = dc.make_solid_probe_any(table, K)

    @jax.jit
    def f_unpack(p):
        return jnp.sum(dc.unpack_codes(p, CHUNK).astype(I32))

    @jax.jit
    def f_rolling(p):
        c = dc.unpack_codes(p, CHUNK)
        return dc.rolling_kmers32(c, K)[-1]

    @jax.jit
    def f_canon(p):
        c = dc.unpack_codes(p, CHUNK)
        km = dc.rolling_kmers32(c, K)
        return dc.canonical_any(km, K)[-1]

    @jax.jit
    def f_probe(p):
        c = dc.unpack_codes(p, CHUNK)
        km = dc.rolling_kmers32(c, K)
        return jnp.sum(probe(km).astype(I32))

    @jax.jit
    def f_rid(p):
        rid0 = jnp.zeros(CHUNK, I32).at[rstart].max(
            jnp.arange(R, dtype=I32), mode="drop")
        rid = jax.lax.cummax(rid0)
        return rid[-1] + jnp.sum(p.astype(I32))

    @jax.jit
    def f_scans(p):
        c = dc.unpack_codes(p, CHUNK)
        x = c.astype(I32)
        pos = jnp.arange(CHUNK, dtype=I32)
        big = jnp.int32(1 << 30)
        T = x == 3
        cumT = jnp.cumsum(T.astype(I32), dtype=I32)

        def rcummin(a):
            return jax.lax.cummin(a[::-1])[::-1]

        nv = rcummin(jnp.where(x == 2, pos, big))
        nt = rcummin(jnp.where(T, pos, big))
        return cumT[-1] + nv[0] + nt[0]

    @jax.jit
    def f_dense_all(p):
        probe_ = dc.make_solid_probe_any(table, K)
        codes = dc.unpack_codes(p, CHUNK)
        kmers = dc.rolling_kmers32(codes, K)
        pos = jnp.arange(CHUNK, dtype=I32)
        big = jnp.int32(1 << 30)
        rid0 = jnp.zeros(CHUNK, I32).at[rstart].max(
            jnp.arange(R, dtype=I32), mode="drop")
        rid = jax.lax.cummax(rid0)
        start_of = rstart[rid]
        len_of = rlen[rid]
        pin = pos - start_of
        V = probe_(kmers) & (pin >= K - 1) & (pin < len_of)
        Vprev = jnp.pad(V[:-1], (1, 0))
        T = Vprev & ~V & (pin >= K) & (pin < len_of)
        cumT = jnp.cumsum(T.astype(I32), dtype=I32)

        def rcummin(a):
            return jax.lax.cummin(a[::-1])[::-1]

        nv = rcummin(jnp.where(V, pos, big))
        nt = rcummin(jnp.where(T, pos, big))
        return cumT[-1] + nv[0] + nt[0] + jnp.sum(V.astype(I32))

    timed("unpack", f_unpack, [(p,) for p in packs])
    timed("unpack+rolling", f_rolling, [(p,) for p in packs])
    timed("unpack+rolling+canonical", f_canon, [(p,) for p in packs])
    timed("unpack+rolling+probe", f_probe, [(p,) for p in packs])
    timed("rid scatter+cummax", f_rid, [(p,) for p in packs])
    timed("3 scans (cumsum+2 rcummin)", f_scans, [(p,) for p in packs])
    timed("dense (full)", f_dense_all, [(p,) for p in packs])


if __name__ == "__main__":
    main()
