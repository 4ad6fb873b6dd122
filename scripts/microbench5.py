"""Trustworthy microbench: every timed call gets fresh input data."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, make_args, reps=5, inner=1):
    # warm/compile
    jax.block_until_ready(fn(*make_args(0)))
    ts = []
    for r in range(1, reps + 1):
        args = [make_args(r * 1000 + j) for j in range(inner)]
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{label}: min {min(ts)*1e3:9.3f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    table = jnp.asarray(rng.integers(0, 2**31, size=1 << 20, dtype=np.int64)
                        .astype(np.int32))

    # dispatch latency, fresh scalar input each call, 20 calls batched
    @jax.jit
    def triv(x):
        return x + 1

    bench("trivial dispatch x20 (fresh inputs)", triv,
          lambda s: (jnp.float32(s),), inner=20)

    # gather throughput, fresh indices
    def mk_idx(n):
        def make(s):
            r = np.random.default_rng(s)
            return (jnp.asarray(r.integers(0, 1 << 20, size=n,
                                           dtype=np.int64).astype(np.int32)),)
        return make

    @jax.jit
    def g(i):
        return jnp.sum(table[i], dtype=jnp.int32)

    for n in (1 << 16, 1 << 20, 1 << 23):
        dt = bench(f"gather {n} fresh", g, mk_idx(n))
        print(f"    -> {n/dt/1e6:10.1f} M elems/s")

    # while_loop per-iteration cost with a gather body, fresh start state
    for B in (64, 8192):
        for iters in (200, 2000):
            @jax.jit
            def loopg(x, n):
                def body(st):
                    i, x = st
                    return i + 1, x + table[(x + i) & ((1 << 20) - 1)] % 3
                return jax.lax.while_loop(lambda st: st[0] < n, body,
                                          (jnp.int32(0), x))

            def make(s, B=B, iters=iters):
                r = np.random.default_rng(s)
                return (jnp.asarray(r.integers(0, 1 << 20, size=B,
                                               dtype=np.int64)
                                    .astype(np.int32)), jnp.int32(iters))

            dt = bench(f"while B={B:>5} iters={iters:>5} gather-body",
                       loopg, make)
            print(f"    -> {dt*1e6/iters:8.2f} us/iter")

    # heavy straight-line: 100 dependent gathers over 2M lanes, fresh
    @jax.jit
    def dense100(i0):
        acc = jnp.zeros(i0.shape, jnp.int32)
        i = i0
        for _ in range(100):
            gv = table[i]
            acc = acc + gv % 5
            i = (i + gv) & ((1 << 20) - 1)
        return jnp.sum(acc, dtype=jnp.int32)

    dt = bench("dense 100 dependent gathers x 2M lanes", dense100,
               mk_idx(1 << 21))
    print(f"    -> {100*(1<<21)/dt/1e6:10.1f} M gathered elems/s")

    # scatter-add fresh
    @jax.jit
    def scat(i):
        c = jnp.zeros(1 << 24, jnp.uint32)
        return c.at[i].add(1)[0]

    dt = bench("scatter-add 4M into 2^24 fresh", scat, mk_idx(1 << 22))
    print(f"    -> {(1<<22)/dt/1e6:10.1f} M elems/s")

    # transfers with fresh buffers
    for sz in (1 << 20, 1 << 22):
        bufs = [np.random.default_rng(i).integers(0, 255, size=sz,
                                                  dtype=np.int64)
                .astype(np.uint8) for i in range(5)]
        t0 = time.perf_counter()
        ds = [jax.device_put(b) for b in bufs]
        jax.block_until_ready(ds)
        up = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        for d in ds:
            np.asarray(d)
        down = (time.perf_counter() - t0) / 5
        print(f"transfer {sz>>20} MB: up {up*1e3:7.2f} ms "
              f"({sz/up/2**30:.2f} GB/s), down {down*1e3:7.2f} ms "
              f"({sz/down/2**30:.2f} GB/s)")


if __name__ == "__main__":
    main()
