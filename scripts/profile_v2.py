"""Per-pass timing + cap counts for the v2 engine on the real corpus.

Dispatches pass-by-pass with a forced sync after each (np.asarray on the
aux counters), so each pass's device time is attributed individually —
the production driver instead pipelines everything (see Tpu2Corrector).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

from br_tpu.correct.engine2 import Tpu2Corrector
from br_tpu.count import Counter
from br_tpu.io.fasta import read_records

REF_FASTA = "/root/reference/tests/data/raw.fasta"
K = 13
CHAIN = ["one", "two", "graph", "greedy", "gap-size"]

reads = [seq for _d, seq, _q in read_records(REF_FASTA)]
counter = Counter(K)
for r in reads:
    counter.count_sequence(r)
solid = counter.to_solid(2)

tc = Tpu2Corrector(solid, CHAIN, confirm=5, max_search=7)

percall = []


def run_profiled(note):
    plans = tc._plan(reads, skip=set())
    total_cap = 0
    for idxs, L, B in plans:
        seqs = [reads[i] for i in idxs]
        codes = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for b, s in enumerate(seqs):
            arr = np.frombuffer(s, dtype=np.uint8)
            codes[b, : len(arr)] = (arr >> 1) & 3
            lens[b] = len(arr)
        b4 = codes.reshape(B, L // 4, 4)
        packed = (b4[..., 0] | (b4[..., 1] << 2) | (b4[..., 2] << 4)
                  | (b4[..., 3] << 6))
        t0 = time.perf_counter()
        a = jax.device_put(packed)
        n = jax.device_put(lens)
        np.asarray(jnp_sum(a))  # force the transfer
        percall.append((time.perf_counter() - t0, "put", L, B, "", None))
        cap_any = None
        for d in ("fwd", "rev"):
            if d == "rev":
                a = tc._get_reverse(L, B)(a, n)
            for strat in CHAIN:
                fn = tc._get_pass2(strat, L, B)
                t0 = time.perf_counter()
                a, n, cap, aux = fn(tc.table, a, n)
                aux_np = np.asarray(aux)
                percall.append((time.perf_counter() - t0, strat, L, B, d,
                                aux_np))
                cap_any = cap if cap_any is None else (cap_any | cap)
        a = tc._get_reverse(L, B)(a, n)
        t0 = time.perf_counter()
        a_np = np.asarray(a)
        cap_np = np.asarray(cap_any)
        percall.append((time.perf_counter() - t0, "get", L, B, "", None))
        total_cap += int(cap_np[: len(idxs)].sum())
    return total_cap


import jax.numpy as jnp


def jnp_sum(x):
    return jnp.sum(x.astype(jnp.int32))


run_profiled("warm")
percall.clear()
t0 = time.perf_counter()
ncap = run_profiled("steady")
total = time.perf_counter() - t0
print(f"steady (per-pass synced): {total:.2f}s  capped_reads={ncap}")
percall.sort(key=lambda x: -x[0])
for dt, what, L, B, d, aux in percall[:40]:
    extra = ""
    if aux is not None:
        extra = (f"sites={aux[0]} ovf={aux[1]} att={aux[2]} bnd={aux[3]} "
                 f"rnd={aux[4]} vis={aux[5]} rec={aux[6]} caplanes={aux[7]}")
    print(f"  {dt*1e3:9.1f} ms  {what:<8} L={L:>6} B={B:>4} {d:<3} {extra}")

# and the production pipelined path, end to end
for trial in range(3):
    t0 = time.perf_counter()
    out = tc.correct_batch(reads, two_side=False)
    print(f"pipelined correct_batch: {time.perf_counter() - t0:.2f}s")
