"""Cost model microbench: all inputs generated on device (no transfers)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, *args, reps=5):
    jax.block_until_ready(fn(jnp.int32(0), *args))
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(jnp.int32(r), *args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{label}: {dt*1e3:9.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    table1 = jnp.asarray(rng.integers(0, 2**31, size=1 << 18, dtype=np.int64)
                         .astype(np.int32))   # 1 MiB
    table64 = jnp.asarray(rng.integers(0, 2**31, size=1 << 24, dtype=np.int64)
                          .astype(np.int32))  # 64 MiB

    def mkidx(seed, n, space):
        i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        h = (i * jnp.uint32(2654435761) + seed.astype(jnp.uint32) *
             jnp.uint32(40503))
        h = h ^ (h >> jnp.uint32(13))
        h = h * jnp.uint32(2246822519)
        return (h & jnp.uint32(space - 1)).astype(jnp.int32)

    for n in (1 << 21, 1 << 23):
        for tbl, sz in ((table1, 1 << 18), (table64, 1 << 24)):
            @jax.jit
            def g(seed, t=tbl, n=n, sz=sz):
                idx = mkidx(seed, n, sz)
                return jnp.sum(t[idx], dtype=jnp.int32)

            dt = bench(f"indep gather {n>>20}M from {sz>>18} MiB-ish", g)
            print(f"    -> {n/dt/1e6:10.1f} M elems/s")

    # dependent chain: 10 rounds over 2M lanes
    @jax.jit
    def chain(seed):
        idx = mkidx(seed, 1 << 21, 1 << 18)
        acc = jnp.zeros(1 << 21, jnp.int32)
        for _ in range(10):
            v = table1[idx]
            acc = acc + v % 7
            idx = (idx + v) & ((1 << 18) - 1)
        return jnp.sum(acc, dtype=jnp.int32)

    dt = bench("10 dependent gather rounds x 2M", chain)
    print(f"    -> {10*(1<<21)/dt/1e6:10.1f} M elems/s")

    # u64 vs u32 arithmetic, 100 ops x 2M
    for dt_ in (jnp.uint32, jnp.uint64):
        @jax.jit
        def alu(seed, dt_=dt_):
            x = mkidx(seed, 1 << 21, 1 << 18).astype(dt_)
            for _ in range(100):
                x = ((x << dt_(2)) ^ (x >> dt_(3))) + dt_(12345)
            return jnp.sum(x.astype(jnp.uint32))

        d = bench(f"100 ALU ops x 2M {dt_.__name__}", alu)
        print(f"    -> {100*(1<<21)/d/1e9:8.1f} G elem-ops/s")

    # while_loop overhead: vector state, no gather
    for B in (1 << 13, 1 << 17):
        @jax.jit
        def wl(seed, B=B):
            x = mkidx(seed, B, 1 << 18)

            def body(st):
                i, x = st
                return i + 1, (x * 3 + 1) & ((1 << 18) - 1)

            return jax.lax.while_loop(lambda st: st[0] < 2000, body,
                                      (jnp.int32(0), x))[1]

        d = bench(f"while 2000 iters arith B={B}", wl)
        print(f"    -> {d*1e6/2000:8.2f} us/iter")

    # while_loop with ONE gather in body
    for B in (1 << 13,):
        @jax.jit
        def wlg(seed, B=B):
            x = mkidx(seed, B, 1 << 18)

            def body(st):
                i, x = st
                return i + 1, (x + table1[x]) & ((1 << 18) - 1)

            return jax.lax.while_loop(lambda st: st[0] < 2000, body,
                                      (jnp.int32(0), x))[1]

        d = bench(f"while 2000 iters 1-gather B={B}", wlg)
        print(f"    -> {d*1e6/2000:8.2f} us/iter")

    # cumsum 2M on-device
    @jax.jit
    def cs(seed):
        x = (mkidx(seed, 1 << 21, 1 << 18) & 1).astype(jnp.int32)
        return jnp.cumsum(x)[-1]

    bench("cumsum 2M (on-device)", cs)

    # searchsorted 64k queries into 2M (via explicit binary search gathers)
    @jax.jit
    def bs(seed):
        arr = jnp.cumsum((mkidx(seed, 1 << 21, 1 << 18) & 1)
                         .astype(jnp.int32))
        q = mkidx(seed + 7, 1 << 16, 1 << 19)
        pos = jnp.zeros((1 << 16,), jnp.int32)
        for level in reversed(range(21)):
            cand = pos + (1 << level)
            cc = jnp.minimum(cand, (1 << 21) - 1)
            pos = jnp.where(arr[cc] <= q, cc, pos)
        return jnp.sum(pos, dtype=jnp.int32)

    dt = bench("binary-search 64k queries into 2M", bs)

    # scatter u8: splice-like, 2M elements into 2M
    @jax.jit
    def sc(seed):
        idx = mkidx(seed, 1 << 21, 1 << 21)
        vals = (idx & 255).astype(jnp.uint8)
        out = jnp.zeros(1 << 21, jnp.uint8)
        return out.at[idx].set(vals)[0]

    dt = bench("scatter-set 2M u8 into 2M", sc)
    print(f"    -> {(1<<21)/dt/1e6:10.1f} M elems/s")


if __name__ == "__main__":
    main()
