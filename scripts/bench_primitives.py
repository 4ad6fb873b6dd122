"""Re-measure the primitive cost model on the real chip (round 3).

Every timed call uses fresh input values (the axon relay memoizes
repeated identical dispatches).  One number per line:
  name  elems  best_ms  Melem/s
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 21          # dense positions per chunk
TBL = 1 << 20        # bitfield words (4 MiB, k=13)
NSCAT = 1 << 18      # scatter width (records)


def timed(name, fn, args_list, n_elems):
    # warm (compile)
    jax.block_until_ready(fn(*args_list[0]))
    best = 1e9
    for args in args_list[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {n_elems:>9d} {best*1e3:9.2f} ms "
          f"{n_elems/best/1e6:9.1f} M/s", flush=True)


def fresh(shape, dtype, hi, n=4, seed=0):
    rng = np.random.default_rng(seed)
    return [jax.device_put(rng.integers(0, hi, size=shape).astype(dtype))
            for _ in range(n)]


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    table = jax.device_put(
        np.random.default_rng(1).integers(0, 1 << 32, size=TBL,
                                          dtype=np.uint32))
    table8 = jax.device_put(
        np.random.default_rng(1).integers(0, 256, size=4 * TBL,
                                          dtype=np.uint8))
    idxs = fresh((P,), np.int32, TBL, n=4)
    idxs8 = fresh((P,), np.int32, 4 * TBL, n=4, seed=2)

    # 1. dense random gather u32 (the probe)
    g32 = jax.jit(lambda t, i: jnp.sum(t[i]))
    timed("gather u32 4MiB", g32, [(table, i) for i in idxs], P)

    # 2. dense random gather u8 (the splice)
    g8 = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.uint32)))
    timed("gather u8 4MiB", g8, [(table8, i) for i in idxs8], P)

    # 2b. gather u8 small table (256 KiB)
    tsmall = jax.device_put(np.random.default_rng(3).integers(
        0, 256, size=1 << 18, dtype=np.uint8))
    idxs_s = fresh((P,), np.int32, 1 << 18, n=4, seed=4)
    timed("gather u8 256KiB", g8, [(tsmall, i) for i in idxs_s], P)

    # 2c. near-sequential gather (src = pos + small jitter)
    pos = np.arange(P, dtype=np.int32)
    seqidx = [jax.device_put(
        np.clip(pos + np.random.default_rng(s).integers(-64, 64, size=P),
                0, P - 1).astype(np.int32)) for s in range(4)]
    big8 = jax.device_put(np.random.default_rng(5).integers(
        0, 256, size=P, dtype=np.uint8))
    timed("gather u8 near-seq", g8, [(big8, i) for i in seqidx], P)

    # 3. plain cumsum over P
    vals = fresh((P,), np.int32, 4, n=4, seed=6)
    cs = jax.jit(lambda v: jnp.cumsum(v)[-1])
    timed("cumsum flat", cs, [(v,) for v in vals], P)

    # 4. hierarchical cumsum (reshape 512)
    def hcs(v):
        C = 512
        x = v.reshape(-1, C)
        w = jnp.cumsum(x, axis=1)
        rows = jnp.cumsum(w[:, -1])
        rows = jnp.concatenate([jnp.zeros(1, v.dtype), rows[:-1]])
        return (w + rows[:, None]).reshape(-1)[-1]

    timed("cumsum hier512", jax.jit(hcs), [(v,) for v in vals], P)

    # 5. scatter-add NSCAT into P
    target0 = jnp.zeros(P, jnp.int32)
    sidx = fresh((NSCAT,), np.int32, P, n=4, seed=7)
    sc = jax.jit(lambda t, i: t.at[i].add(1)[0])
    timed("scatter-add 256k", sc, [(target0, i) for i in sidx], NSCAT)

    # 6. elementwise chain u32 (20 ops)
    def ew(v):
        x = v.astype(jnp.uint32)
        for t in range(20):
            x = (x << jnp.uint32(2)) ^ (x >> jnp.uint32(3))
        return x[-1]

    timed("elementwise 20op", jax.jit(ew), [(v,) for v in vals], 20 * P)

    # 7. dispatch overhead: tiny jitted op, fresh inputs
    tiny = fresh((8,), np.int32, 100, n=6, seed=8)
    tf = jax.jit(lambda v: v + 1)
    timed("dispatch tiny", tf, [(v,) for v in tiny], 1)

    # 8. while_loop iteration overhead (1000 trips, small body)
    def wl(v):
        def body(st):
            i, x = st
            return (i + 1, x + jnp.sum(v[:8]))
        return jax.lax.while_loop(lambda st: st[0] < 1000, body,
                                  (jnp.int32(0), jnp.int32(0)))[1]

    timed("while1000 small", jax.jit(wl), [(v,) for v in vals], 1000)

    # 9. memoization probe: SAME input twice vs fresh
    same = idxs[1]
    t0 = time.perf_counter(); jax.block_until_ready(g32(table, same))
    t1 = time.perf_counter(); jax.block_until_ready(g32(table, same))
    t2 = time.perf_counter()
    print(f"memo-check same-input: 1st {1e3*(t1-t0):.2f} ms, "
          f"2nd {1e3*(t2-t1):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
