"""Op-pattern costs behind the r5 pass redesign (readback-synced,
fresh inputs, S-loop differenced so the dispatch floor cancels).

Patterns measured at CHUNK=2^20 (the production chunk size):
  A. small-table gather  start_of = rstart[rid]      (the pattern to kill)
  B. scatter+cummax fill (the proposed replacement)
  C. scans: cumsum/cummax i32, reverse cummin vs flip+cummin+flip
  D. big gathers: CHUNK-from-CHUNK u8, CHUNK-from-9M u8 (concat table)
  E. probe gather (u32 4MiB bitfield + bit test)
  F. scatters: 32k updates into CHUNK, CHUNK updates into CHUNK
  G. rolling_kmers32, unpack+pack
Run on the chip:  python scripts/op_patterns.py [CHUNK_LOG2]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from br_tpu.correct import device_codec as dc

I32 = jnp.int32
U32 = jnp.uint32
U8 = jnp.uint8

CHUNK = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
R = 512
NS = CHUNK // 32
N = 5          # fresh-input replicates per timing
S_LO, S_HI = 2, 10


def run(fn, inputs):
    o = fn(*inputs[0])
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for x in inputs:
        np.asarray(jax.tree_util.tree_leaves(fn(*x))[0])
    return (time.perf_counter() - t0) / len(inputs)


def diff(make, inputs, lo=S_LO, hi=S_HI):
    t_small = run(make(lo), inputs)
    t_big = run(make(hi), inputs)
    return (t_big - t_small) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  CHUNK=2^{CHUNK.bit_length()-1}",
          flush=True)

    rstarts = []
    for _ in range(N):
        rs = np.sort(rng.choice(CHUNK - 64, R - 1, replace=False)).astype(
            np.int32)
        rs = np.concatenate([[0], rs]).astype(np.int32)
        rstarts.append(jax.device_put(rs))
    perm = [jax.device_put(rng.permutation(CHUNK).astype(np.int32))
            for _ in range(N)]
    dense_u8 = [jax.device_put(rng.integers(0, 255, CHUNK, np.uint8))
                for _ in range(N)]
    dense_i32 = [jax.device_put(rng.integers(0, 100, CHUNK, np.int32))
                 for _ in range(N)]

    # --- A: CHUNK-from-R gather (rid-style) --------------------------------
    def make_a(S):
        @jax.jit
        def f(rs, idx):
            rid0 = jnp.zeros(CHUNK, I32).at[rs].max(
                jnp.arange(R, dtype=I32), mode="drop")
            rid = jax.lax.cummax(rid0)
            acc = jnp.int32(0)
            for _ in range(S):
                v = rs[rid]               # the pattern under test
                rid = (rid + (v & 1)) % R
                acc += v[0]
            return acc
        return f

    t = diff(make_a, list(zip(rstarts, perm)))
    print(f"A. rstart[rid] gather CHUNK-from-{R}: {t*1e3:7.2f} ms", flush=True)

    # --- B: scatter+cummax fill -------------------------------------------
    def make_b(S):
        @jax.jit
        def f(rs, x):
            acc = x
            for _ in range(S):
                sc = jnp.zeros(CHUNK, I32).at[rs].max(
                    rs + acc[0] % 3, mode="drop")
                acc = acc + jax.lax.cummax(sc)
            return acc[0]
        return f

    t = diff(make_b, list(zip(rstarts, dense_i32)))
    print(f"B. scatter(R)+cummax fill:            {t*1e3:7.2f} ms", flush=True)

    # --- C: scans ---------------------------------------------------------
    def make_cumsum(S):
        @jax.jit
        def f(x):
            cur = x
            for _ in range(S):
                cur = jnp.cumsum(cur, dtype=I32) % 997
            return cur[-1]
        return f

    def make_cummax(S):
        @jax.jit
        def f(x):
            cur = x
            for _ in range(S):
                cur = jax.lax.cummax(cur) % 997
            return cur[-1]
        return f

    def make_rcummin_rev(S):
        @jax.jit
        def f(x):
            cur = x
            for _ in range(S):
                cur = jax.lax.cummin(cur % 997, reverse=True)
            return cur[0]
        return f

    def make_rcummin_flip(S):
        @jax.jit
        def f(x):
            cur = x
            for _ in range(S):
                cur = jnp.flip(jax.lax.cummin(jnp.flip(cur % 997)))
            return cur[0]
        return f

    # NOTE: an i64-cummax case was measured once and REMOVED: it
    # SIGSEGVs the remote XLA compiler (tpu_compile_helper).  Avoid i64
    # scans entirely on this stack.
    for name, mk in (("cumsum i32", make_cumsum),
                     ("cummax i32", make_cummax),
                     ("cummin rev=True", make_rcummin_rev),
                     ("flip+cummin+flip", make_rcummin_flip)):
        t = diff(mk, [(d,) for d in dense_i32])
        print(f"C. {name:18s} CHUNK:            {t*1e3:7.2f} ms", flush=True)

    # --- D: big gathers ---------------------------------------------------
    def make_d1(S):
        @jax.jit
        def f(tbl, idx):
            cur = idx
            acc = jnp.uint8(0)
            for _ in range(S):
                v = tbl[cur]
                cur = (cur + v.astype(I32)) % CHUNK
                acc += v[0]
            return acc
        return f

    t = diff(make_d1, list(zip(dense_u8, perm)))
    print(f"D. gather CHUNK-from-CHUNK u8:        {t*1e3:7.2f} ms", flush=True)

    big_u8 = [jax.device_put(rng.integers(0, 255, CHUNK + (NS * 256),
                                          np.uint8)) for _ in range(N)]

    def make_d2(S):
        M = CHUNK + NS * 256

        @jax.jit
        def f(tbl, idx):
            cur = idx
            acc = jnp.uint8(0)
            for _ in range(S):
                v = tbl[cur]
                cur = (cur + v.astype(I32)) % M
                acc += v[0]
            return acc
        return f

    t = diff(make_d2, list(zip(big_u8, perm)))
    print(f"D. gather CHUNK-from-concat(9M) u8:   {t*1e3:7.2f} ms", flush=True)

    # --- E: probe ---------------------------------------------------------
    words = [jax.device_put(rng.integers(0, 1 << 32, 1 << 20, np.uint32))
             for _ in range(N)]
    kmerss = [jax.device_put(rng.integers(0, 1 << 25, CHUNK, np.uint32))
              for _ in range(N)]

    def make_e(S):
        @jax.jit
        def f(w, km):
            probe = dc.make_solid_probe_any(w, 13)
            cur = km
            acc = jnp.int32(0)
            for _ in range(S):
                v = probe(cur)
                cur = cur + v.astype(U32)
                acc += v[0].astype(I32)
            return acc
        return f

    t = diff(make_e, list(zip(words, kmerss)))
    print(f"E. probe(kmers) CHUNK (canonical+bit):{t*1e3:7.2f} ms", flush=True)

    # --- E2: large-k hash probe (sorted-u64 binary search; VERDICT r4
    # item 5 — the measured cost of the k=19-31 device path's probe) ---
    for HN in (1 << 16, 1 << 20):
        htables = [jax.device_put(np.sort(rng.choice(
            1 << 41, HN, replace=False).astype(np.uint64)))
            for _ in range(N)]
        hkmers = [jax.device_put(rng.integers(0, 1 << 42, CHUNK,
                                              np.uint64))
                  for _ in range(N)]

        def make_e2(S, tbl0=None):
            @jax.jit
            def f(tbl, km):
                probe = dc.make_hash_probe_any(tbl, 21)
                cur = km
                acc = jnp.int32(0)
                for _ in range(S):
                    v = probe(cur)
                    cur = cur + v.astype(jnp.uint64)
                    acc += v[0].astype(I32)
                return acc
            return f

        t = diff(make_e2, list(zip(htables, hkmers)), lo=1, hi=4)
        print(f"E2 hash probe CHUNK from {HN>>10}k-entry sorted u64:"
              f" {t*1e3:8.2f} ms", flush=True)

    # --- F: scatters ------------------------------------------------------
    upd = [jax.device_put(rng.integers(0, CHUNK, NS, np.int32))
           for _ in range(N)]

    def make_f1(S):
        @jax.jit
        def f(u, x):
            acc = x
            for _ in range(S):
                acc = acc.at[u].max(u + acc[0] % 3, mode="drop")
            return acc[0]
        return f

    t = diff(make_f1, list(zip(upd, dense_i32)))
    print(f"F. scatter-max {NS>>10}k updates -> CHUNK:    {t*1e3:7.2f} ms",
          flush=True)

    def make_f2(S):
        @jax.jit
        def f(u, x):
            acc = x
            for _ in range(S):
                acc = acc.at[jnp.clip(u + acc[0] % 3, 0, CHUNK - 1)].add(
                    1, mode="drop")
            return acc[0]
        return f

    t = diff(make_f2, list(zip(perm, dense_i32)))
    print(f"F. scatter-add CHUNK updates -> CHUNK:{t*1e3:7.2f} ms", flush=True)

    # --- G: codec ---------------------------------------------------------
    packed = [jax.device_put(rng.integers(0, 255, CHUNK // 4, np.uint8))
              for _ in range(N)]

    def make_g1(S):
        @jax.jit
        def f(p):
            acc = jnp.uint8(0)
            cur = p
            for _ in range(S):
                c = dc.unpack_codes(cur, CHUNK)
                cur = dc.pack_codes(c ^ (acc & 1))
                acc += cur[0]
            return acc
        return f

    t = diff(make_g1, [(p,) for p in packed])
    print(f"G. unpack+pack CHUNK:                 {t*1e3:7.2f} ms", flush=True)

    def make_g2(S):
        @jax.jit
        def f(p):
            c = dc.unpack_codes(p, CHUNK)
            acc = jnp.uint32(0)
            for _ in range(S):
                km = dc.rolling_kmers32(c ^ (acc & 1).astype(U8), 13)
                acc += km[-1]
            return acc
        return f

    t = diff(make_g2, [(p,) for p in packed])
    print(f"G. rolling_kmers32 CHUNK:             {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
