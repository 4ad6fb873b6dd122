"""True per-iteration cost of gather-body loops, by iteration count."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: min {min(ts)*1e3:9.3f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**31, size=1 << 20, dtype=np.int64)
                        .astype(np.int32))

    for B in (32, 8192):
        for iters in (100, 1000, 10000):
            x0 = jnp.zeros(B, jnp.int32)

            @jax.jit
            def loop_gather(x, n):
                def body(st):
                    i, x = st
                    g = table[(x + i) & ((1 << 20) - 1)]
                    return i + 1, x + g % 3
                return jax.lax.while_loop(lambda st: st[0] < n, body,
                                          (jnp.int32(0), x))

            t = bench(f"while B={B:>5} iters={iters:>6} 1-gather body",
                      loop_gather, x0, jnp.int32(iters))
    # 20-gather body (like a scenario attempt)
    for B in (32, 8192):
        x0 = jnp.zeros(B, jnp.int32)

        @jax.jit
        def loop_g20(x, n):
            def body(st):
                i, x = st
                acc = x
                for j in range(20):
                    acc = acc + table[(acc + j) & ((1 << 20) - 1)] % 3
                return i + 1, acc
            return jax.lax.while_loop(lambda st: st[0] < n, body,
                                      (jnp.int32(0), x))

        bench(f"while B={B:>5} iters=1000 20-gather body", loop_g20, x0,
              jnp.int32(1000))

    # dense attempt simulation: 200 gathers over 2M lanes, straight-line
    idx2 = jnp.asarray(rng.integers(0, 1 << 20, size=1 << 21, dtype=np.int64)
                       .astype(np.int32))

    @jax.jit
    def dense200(i0):
        acc = jnp.zeros(1 << 21, jnp.int32)
        i = i0
        for _ in range(50):
            g = table[i]
            acc = acc + g % 5
            i = (i + g) & ((1 << 20) - 1)
        return acc

    bench("dense 50 dependent gathers x 2M lanes", dense200, idx2)


if __name__ == "__main__":
    main()
