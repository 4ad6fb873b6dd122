"""Definitive gather + scan + readback cost on this chip (readback-synced,
fresh inputs, floor-subtracted).

Method: for each measurement, time a jitted fn that LOOPS the op S times
with data dependence (so S× the op executes in ONE dispatch), sync via a
scalar np.asarray readback; per-op cost = (t(S=big) - t(S=small)) /
(S_big - S_small) — the dispatch+readback floor cancels."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def run(fn, inputs):
    o = fn(*inputs[0])
    np.asarray(o)
    t0 = time.perf_counter()
    for x in inputs:
        np.asarray(fn(*x))
    return (time.perf_counter() - t0) / len(inputs)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    TBL = 1 << 20  # 4 MiB u32 table
    table = jax.device_put(rng.integers(0, 1 << 32, TBL, dtype=np.uint32))
    N = 6

    # readback floor
    @jax.jit
    def nop(x):
        return x[0]

    xs = [jax.device_put(rng.integers(0, TBL, 8, dtype=np.int32))
          for _ in range(N)]
    floor = run(nop, [(x,) for x in xs])
    print(f"dispatch+scalar-readback floor: {floor*1000:.2f} ms",
          flush=True)

    for M in (2048, 65536, 1 << 20):
        idxs = [jax.device_put(rng.integers(0, TBL, M, dtype=np.int32))
                for _ in range(N)]

        def make(S):
            @jax.jit
            def f(idx):
                acc = jnp.uint32(0)
                cur = idx
                for _ in range(S):
                    v = table[cur]            # dependent chain of gathers
                    cur = (cur + v.astype(jnp.int32)) % TBL
                    acc = acc + v[0]
                return acc

            return f

        t_small = run(make(2), [(i,) for i in idxs])
        t_big = run(make(12), [(i,) for i in idxs])
        per = (t_big - t_small) / 10
        print(f"gather {M:8d} idx from 4MiB: {per*1000:7.3f} ms/op "
              f"({per/M*1e9:6.2f} ns/elem)", flush=True)

    # scans
    for M in (1 << 18, 1 << 20):
        data = [jax.device_put(rng.integers(0, 100, M, dtype=np.int32))
                for _ in range(N)]

        def make_s(S):
            @jax.jit
            def f(x):
                cur = x
                for _ in range(S):
                    cur = jnp.cumsum(cur, dtype=jnp.int32) % 997
                return cur[-1]

            return f

        t_small = run(make_s(1), [(d,) for d in data])
        t_big = run(make_s(9), [(d,) for d in data])
        per = (t_big - t_small) / 8
        print(f"cumsum {M:8d}: {per*1000:7.3f} ms/op", flush=True)

    # elementwise chain on (2048,) — per-op latency floor for small shapes
    data = [jax.device_put(rng.integers(0, 100, 2048, dtype=np.int32))
            for _ in range(N)]

    def make_e(S):
        @jax.jit
        def f(x):
            cur = x
            for _ in range(S):
                cur = cur * 3 + 1
            return cur[0]

        return f

    t_small = run(make_e(8), [(d,) for d in data])
    t_big = run(make_e(264), [(d,) for d in data])
    per = (t_big - t_small) / 256
    print(f"elementwise (2048,): {per*1e6:7.1f} us/op", flush=True)

    # readback size scaling
    for M in (1 << 16, 1 << 20, 1 << 23):
        @jax.jit
        def ident(x):
            return x + jnp.uint8(1)

        data = [jax.device_put(rng.integers(0, 255, M, dtype=np.uint8))
                for _ in range(N)]
        t = run(ident, [(d,) for d in data])
        print(f"dispatch+readback {M>>10:6d} KB: {t*1000:7.1f} ms "
              f"({M/t/1e6:.0f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
