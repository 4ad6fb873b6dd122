"""Isolate which primitive pattern makes XLA compile slow (CPU backend)."""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
# disable the persistent cache to measure real compile times
jax.config.update("jax_compilation_cache_dir", "/tmp/nocache")

BL = 227 * 9216
NS = max(512, BL // 64)
I32 = jnp.int32


def lower_bound(arr, q):
    n = arr.shape[0]
    levels = max(1, (n).bit_length())
    pos = jnp.zeros(jnp.shape(q), dtype=I32)
    for level in reversed(range(levels)):
        cand = pos + (1 << level)
        ok = (cand <= n) & (arr[jnp.clip(cand - 1, 0, n - 1)] < q)
        pos = jnp.where(ok, cand, pos)
    return pos


def t(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name:36s} {time.perf_counter() - t0:7.1f}s", flush=True)


mask = jnp.zeros(BL, dtype=bool)
cum = jnp.zeros(BL, dtype=I32)
q = jnp.arange(1, NS + 1, dtype=I32)

t("cumsum(2M)", lambda m: jnp.cumsum(m.astype(I32)), mask)
t("lower_bound(2M, 32k)", lower_bound, cum, q)
t("cumsum + lower_bound",
  lambda m, q: lower_bound(jnp.cumsum(m.astype(I32)), q), mask, q)
t("gather 32k from 2M x21",
  lambda c, q: sum(c[jnp.clip(q * (i + 1), 0, BL - 1)].sum()
                   for i in range(21)), cum, q)
