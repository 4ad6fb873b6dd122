"""Isolate dispatch latency behavior of the axon relay."""

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
    ts = np.array(ts) * 1e3
    print(f"{label}: min {ts.min():8.3f} ms  med {np.median(ts):8.3f} ms  "
          f"max {ts.max():8.3f} ms")
    return ts.min()


def main():
    print("device:", jax.devices()[0])

    @jax.jit
    def triv(x):
        return x + 1

    x = jnp.zeros(8, jnp.float32)
    bench("trivial dispatch (fresh)", triv, x)

    # pipelined: enqueue 20 then sync once
    out = triv(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = triv(y)
    jax.block_until_ready(y)
    print(f"20 chained trivial dispatches, one sync: "
          f"{(time.perf_counter()-t0)*1e3:.3f} ms")

    # now a couple of fresh compilations
    @jax.jit
    def f2(x):
        return jnp.sin(x) * 2

    @jax.jit
    def f3(x):
        return jnp.cos(x) + 3

    jax.block_until_ready(f2(x))
    jax.block_until_ready(f3(x))

    bench("trivial dispatch (after 2 compiles)", triv, x)

    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = triv(y)
    jax.block_until_ready(y)
    print(f"20 chained trivial dispatches, one sync: "
          f"{(time.perf_counter()-t0)*1e3:.3f} ms")

    # big arith while loop again, fresh process state
    x0 = jnp.zeros(8192, jnp.int32)

    @jax.jit
    def loop_arith(x):
        def body(st):
            i, x = st
            return i + 1, x * 3 + 1
        return jax.lax.while_loop(lambda st: st[0] < 10000, body,
                                  (jnp.int32(0), x))

    bench("while 10000 iters arith B=8192", loop_arith, x0)


if __name__ == "__main__":
    main()
