"""Compile-time measurement for the v3 pass programs on the real TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct.engine3 import make_pass3_fn, make_reverse3_fn

K = 13
CHUNK = 1 << 21
R = 512

table = jnp.zeros((1 << (2 * K - 1)) // 32, dtype=jnp.uint32)
codes = jnp.zeros(CHUNK, dtype=jnp.uint8)
rstart = np.full(R, CHUNK, np.int32)
rstart[0] = 0
rlen = np.zeros(R, np.int32)
rlen[0] = 4096
rstart = jnp.asarray(rstart)
rlen = jnp.asarray(rlen)

print("device:", jax.devices()[0], flush=True)
total = 0.0
for strat in ("one", "two", "graph", "greedy", "gap-size"):
    fn = make_pass3_fn(K, strat, 5, 7, 5, CHUNK, R)
    t0 = time.perf_counter()
    low = fn.lower(table, codes, rstart, rlen)
    t1 = time.perf_counter()
    low.compile()
    t2 = time.perf_counter()
    total += t2 - t0
    print(f"{strat:10s} lower {t1-t0:6.1f}s compile {t2-t1:6.1f}s",
          flush=True)
rev = make_reverse3_fn(CHUNK, R)
t0 = time.perf_counter()
rev.lower(codes, rstart, rlen).compile()
t1 = time.perf_counter()
total += t1 - t0
print(f"reverse    total {t1-t0:6.1f}s", flush=True)
print(f"TOTAL cold compile: {total:.1f}s", flush=True)
