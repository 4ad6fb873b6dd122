"""Microbenchmarks: gather throughput + while_loop iteration overhead."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # 1. random gather from a 4 MiB table (k=13 bitfield as u32 words)
    table = jnp.asarray(rng.integers(0, 2**32, size=1 << 20, dtype=np.uint64)
                        .astype(np.uint32))
    for n in (1 << 16, 1 << 20, 1 << 23):
        idx = jnp.asarray(rng.integers(0, 1 << 20, size=n, dtype=np.int32))

        @jax.jit
        def g(t, i):
            return jnp.sum(t[i].astype(jnp.uint64))

        dt = timeit(g, table, idx)
        print(f"gather {n:>9} elems from 4MiB: {dt*1e3:8.3f} ms "
              f"-> {n/dt/1e6:8.1f} M elems/s")

    # 2. same but 2D-shaped gather (B, L) like the engine's vmask precompute
    B, L = 1024, 2048
    idx2 = jnp.asarray(rng.integers(0, 1 << 20, size=(B, L), dtype=np.int32))

    @jax.jit
    def g2(t, i):
        return jnp.sum(t[i].astype(jnp.uint64))

    dt = timeit(g2, table, idx2)
    n = B * L
    print(f"gather {n:>9} elems (2D)       : {dt*1e3:8.3f} ms "
          f"-> {n/dt/1e6:8.1f} M elems/s")

    # 3. while_loop iteration overhead: tiny body, B-lane vector state
    for B in (32, 1024, 16384):
        x0 = jnp.zeros(B, jnp.int32)

        @jax.jit
        def loop(x):
            def body(st):
                i, x = st
                return i + 1, x + jnp.sum(table[x & ((1 << 20) - 1)]
                                          .astype(jnp.int32)) * 0 + 1
            def cond(st):
                return st[0] < 1000
            return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

        dt = timeit(loop, x0)
        print(f"while_loop 1000 iters, B={B:>6}, body=1 gather+add: "
              f"{dt*1e3:8.2f} ms -> {dt*1e6/1000:6.1f} us/iter")

    # 4. scatter-add (counting) throughput
    idx = jnp.asarray(rng.integers(0, 1 << 24, size=1 << 22, dtype=np.int32))

    @jax.jit
    def scat(i):
        c = jnp.zeros(1 << 24, jnp.uint32)
        return c.at[i].add(1)[0]

    dt = timeit(scat, idx)
    print(f"scatter-add {1<<22} into 2^24: {dt*1e3:8.3f} ms "
          f"-> {(1<<22)/dt/1e6:8.1f} M elems/s")


if __name__ == "__main__":
    main()
