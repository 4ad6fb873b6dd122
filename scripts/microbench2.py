"""Second round: loop variants, cumsum, searchsorted, sort, transfers."""

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
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    # while_loop with pure vector-arith body (no gather)
    for B in (256, 8192):
        x0 = jnp.zeros(B, jnp.int32)

        @jax.jit
        def loop_arith(x):
            def body(st):
                i, x = st
                return i + 1, x * 3 + 1
            return jax.lax.while_loop(lambda st: st[0] < 1000, body,
                                      (jnp.int32(0), x))

        dt = timeit(loop_arith, x0)
        print(f"while 1000 iters arith-only B={B}: {dt*1e3:7.2f} ms "
              f"({dt*1e6/1000:5.2f} us/iter)")

    # fori_loop with gather body
    table = jnp.asarray(rng.integers(0, 2**31, size=1 << 20, dtype=np.int64)
                        .astype(np.int32))
    x0 = jnp.zeros(8192, jnp.int32)

    @jax.jit
    def loop_gather(x):
        def body(i, x):
            return x + table[x & ((1 << 20) - 1)] * 0 + 1
        return jax.lax.fori_loop(0, 1000, body, x0)

    dt = timeit(loop_gather, x0)
    print(f"fori 1000 iters gather B=8192: {dt*1e3:7.2f} ms "
          f"({dt*1e6/1000:5.2f} us/iter)")

    # scalar while loop (all SMEM)
    @jax.jit
    def loop_scalar(n):
        def body(st):
            i, a = st
            return i + 1, a * 3 + 1
        return jax.lax.while_loop(lambda st: st[0] < n, body,
                                  (jnp.int32(0), jnp.int32(1)))

    dt = timeit(loop_scalar, jnp.int32(1000))
    print(f"while 1000 iters scalar-only: {dt*1e3:7.2f} ms "
          f"({dt*1e6/1000:5.2f} us/iter)")

    # cumsum over 2M
    big = jnp.asarray(rng.integers(0, 2, size=1 << 21, dtype=np.int64)
                      .astype(np.int32))
    dt = timeit(jax.jit(jnp.cumsum), big)
    print(f"cumsum 2M: {dt*1e3:7.3f} ms")

    # searchsorted: 32k queries into 2M sorted
    sorted_arr = jnp.cumsum(big)
    q = jnp.asarray(rng.integers(0, int(1e6), size=1 << 15, dtype=np.int64)
                    .astype(np.int32))

    @jax.jit
    def ss(a, v):
        return jnp.searchsorted(a, v)

    dt = timeit(ss, sorted_arr, q)
    print(f"searchsorted 32k into 2M: {dt*1e3:7.3f} ms")

    # sort 32k
    s32 = jnp.asarray(rng.integers(0, 2**31, size=1 << 15, dtype=np.int64)
                      .astype(np.int32))
    dt = timeit(jax.jit(jnp.sort), s32)
    print(f"sort 32k: {dt*1e3:7.3f} ms")

    # top_k E=4096 of 74k row
    row = jnp.asarray(rng.integers(0, 2**31, size=(28, 1 << 16),
                                   dtype=np.int64).astype(np.int32))

    @jax.jit
    def topk(x):
        return jax.lax.top_k(x, 4096)[0]

    dt = timeit(topk, row)
    print(f"top_k 4096 of (28, 65536): {dt*1e3:7.3f} ms")

    # scatter-min 32k into 32k
    idx = jnp.asarray(rng.integers(0, 1 << 15, size=1 << 15, dtype=np.int64)
                      .astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**31, size=1 << 15, dtype=np.int64)
                       .astype(np.int32))

    @jax.jit
    def scmin(i, v):
        d = jnp.full(1 << 15, 2**31 - 1, jnp.int32)
        return d.at[i].min(v)

    dt = timeit(scmin, idx, vals)
    print(f"scatter-min 32k into 32k: {dt*1e3:7.3f} ms")

    # host->device and device->host transfer of 4MB
    h = np.zeros((1 << 22,), np.uint8)
    t0 = time.perf_counter()
    for _ in range(5):
        d = jax.device_put(h)
        jax.block_until_ready(d)
    up = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(d)
    down = (time.perf_counter() - t0) / 5
    print(f"transfer 4MB: up {up*1e3:.2f} ms ({4/up/1e3:.2f} GB/s), "
          f"down {down*1e3:.2f} ms ({4/down/1e3:.2f} GB/s)")

    # dispatch latency: trivial jitted fn
    @jax.jit
    def triv(x):
        return x + 1

    dt = timeit(triv, jnp.zeros(8, jnp.float32))
    print(f"trivial dispatch: {dt*1e6:.0f} us")


if __name__ == "__main__":
    main()
