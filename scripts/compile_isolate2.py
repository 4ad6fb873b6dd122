"""Bisect the stage1-3 prefix of passfn for compile-time hogs (CPU)."""

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
jax.config.update("jax_compilation_cache_dir", "/tmp/nocache")

from br_tpu.correct import device_codec as dc
from br_tpu.correct.engine2 import _lower_bound, _rcummin

B, L = 227, 9216
BL = B * L
NS = max(512, BL // 64)
K = 13
I32 = jnp.int32
BIG = np.int32(1 << 30)

table = jnp.zeros((1 << (2 * K - 1)) // 32, dtype=jnp.uint32)
packed = jnp.zeros((B, L // 4), dtype=jnp.uint8)
lens = jnp.full(B, L - 1024, dtype=jnp.int32)


def build(upto):
    def f(table, packed_in, lens):
        probe = dc.make_solid_probe_any(table, K)
        codes2 = dc.unpack_codes(packed_in, L)
        kmers2 = dc.rolling_kmers32(codes2, K)
        pos = jnp.arange(L, dtype=I32)[None, :]
        lensb = lens[:, None]
        V2 = probe(kmers2) & (pos >= K - 1) & (pos < lensb)
        Vprev = jnp.pad(V2[:, :-1], ((0, 0), (1, 0)))
        T2 = Vprev & ~V2 & (pos >= K) & (pos < lensb)
        if upto == 1:
            return (jnp.sum(V2.astype(I32)), jnp.sum(T2.astype(I32)))
        ntp = _rcummin(jnp.where(T2, pos, BIG))
        nvp = _rcummin(jnp.where(V2, pos, BIG))
        lastinv = jax.lax.cummax(jnp.where(~V2, pos, -1), axis=1)
        runlen = pos - lastinv
        Bm2 = (runlen == K + 16) & (pos < lensb)
        nbp = _rcummin(jnp.where(Bm2, pos, BIG))
        rowbase = (jnp.arange(B, dtype=I32) * L)[:, None]
        nt = jnp.where(ntp < BIG, ntp + rowbase, BIG).reshape(-1)
        nv = jnp.where(nvp < BIG, nvp + rowbase, BIG).reshape(-1)
        se2 = jnp.minimum(jnp.where(nbp < BIG, nbp + 1, BIG),
                          lensb) + rowbase
        se = se2.reshape(-1)
        codes = codes2.reshape(-1)
        kmers = kmers2.reshape(-1)
        if upto == 2:
            return (jnp.sum(nt), jnp.sum(nv), jnp.sum(se),
                    jnp.sum(Bm2.astype(I32)))
        Tf = T2.reshape(-1)
        cumT = jnp.cumsum(Tf.astype(I32))
        if upto == 21:
            return (jnp.sum(cumT),)
        n_sites = cumT[-1]
        sflat = jnp.clip(
            _lower_bound(cumT, jnp.arange(1, NS + 1, dtype=I32)), 0, BL - 1)
        if upto == 22:
            return (jnp.sum(sflat),)
        smask = jnp.arange(NS, dtype=I32) < jnp.minimum(n_sites, NS)
        cum_rs = cumT[jnp.clip(rowbase[:, 0] - 1, 0, BL - 1)]
        cum_rs = jnp.where(rowbase[:, 0] > 0, cum_rs, 0)
        cum_re = cumT[rowbase[:, 0] + (L - 1)]
        cap_lane = cum_re > jnp.maximum(cum_rs, NS)
        if upto == 23:
            return (jnp.sum(sflat), jnp.sum(cap_lane.astype(I32)))
        s_lane = sflat // L
        s_len = s_lane * L + lens[jnp.clip(s_lane, 0, B - 1)]
        s_se = se[sflat]
        s_reg = kmers[sflat].astype(jnp.uint64)
        s_pos = jnp.where(smask, sflat, BIG)
        return (jnp.sum(s_pos), jnp.sum(s_reg), jnp.sum(s_se),
                jnp.sum(cap_lane.astype(I32)))
    return f


for upto in [1, 2, 21, 22, 23, 3]:
    fn = build(upto)
    t0 = time.perf_counter()
    jax.jit(fn).lower(table, packed, lens).compile()
    print(f"upto {upto}: {time.perf_counter() - t0:7.1f}s", flush=True)


def build_barrier():
    def f(table, packed_in, lens):
        probe = dc.make_solid_probe_any(table, K)
        codes2 = dc.unpack_codes(packed_in, L)
        kmers2 = dc.rolling_kmers32(codes2, K)
        pos = jnp.arange(L, dtype=I32)[None, :]
        lensb = lens[:, None]
        V2 = probe(kmers2) & (pos >= K - 1) & (pos < lensb)
        Vprev = jnp.pad(V2[:, :-1], ((0, 0), (1, 0)))
        T2 = Vprev & ~V2 & (pos >= K) & (pos < lensb)
        ntp = _rcummin(jnp.where(T2, pos, BIG))
        nvp = _rcummin(jnp.where(V2, pos, BIG))
        lastinv = jax.lax.cummax(jnp.where(~V2, pos, -1), axis=1)
        runlen = pos - lastinv
        Bm2 = (runlen == K + 16) & (pos < lensb)
        nbp = _rcummin(jnp.where(Bm2, pos, BIG))
        rowbase = (jnp.arange(B, dtype=I32) * L)[:, None]
        nt = jnp.where(ntp < BIG, ntp + rowbase, BIG).reshape(-1)
        nv = jnp.where(nvp < BIG, nvp + rowbase, BIG).reshape(-1)
        se2 = jnp.minimum(jnp.where(nbp < BIG, nbp + 1, BIG),
                          lensb) + rowbase
        se = se2.reshape(-1)
        codes = codes2.reshape(-1)
        kmers = kmers2.reshape(-1)
        Tf = T2.reshape(-1)
        cumT = jnp.cumsum(Tf.astype(I32))
        # materialize the dense tables before any compacted gather
        se, codes, kmers, cumT, nt, nv = jax.lax.optimization_barrier(
            (se, codes, kmers, cumT, nt, nv))
        n_sites = cumT[-1]
        sflat = jnp.clip(
            _lower_bound(cumT, jnp.arange(1, NS + 1, dtype=I32)), 0, BL - 1)
        smask = jnp.arange(NS, dtype=I32) < jnp.minimum(n_sites, NS)
        cum_rs = cumT[jnp.clip(rowbase[:, 0] - 1, 0, BL - 1)]
        cum_rs = jnp.where(rowbase[:, 0] > 0, cum_rs, 0)
        cum_re = cumT[rowbase[:, 0] + (L - 1)]
        cap_lane = cum_re > jnp.maximum(cum_rs, NS)
        s_lane = sflat // L
        s_len = s_lane * L + lens[jnp.clip(s_lane, 0, B - 1)]
        s_se = se[sflat]
        s_reg = kmers[sflat].astype(jnp.uint64)
        s_pos = jnp.where(smask, sflat, BIG)
        return (jnp.sum(s_pos), jnp.sum(s_reg), jnp.sum(s_se),
                jnp.sum(cap_lane.astype(I32)))
    return f


t0 = time.perf_counter()
jax.jit(build_barrier()).lower(table, packed, lens).compile()
print(f"barrier: {time.perf_counter() - t0:7.1f}s", flush=True)
