"""Per-pass timing + cap counts for the v2 engine on the real corpus."""

import time

import jax
import numpy as np

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
n_fallback = [0]

orig_chunk = Tpu2Corrector._correct_chunk


def patched(self, seqs, L, two_side):
    import jax.numpy as jnp
    from br_tpu.correct.engine import _reverse_batch

    B = min(self.MAX_B, max(8, self.TARGET_ELEMS // L))
    ascii_in = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for b, s in enumerate(seqs):
        ascii_in[b, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[b] = len(s)
    t0 = time.perf_counter()
    a = jax.device_put(ascii_in)
    n = jax.device_put(lens)
    jax.block_until_ready((a, n))
    percall.append((time.perf_counter() - t0, "put", L, B, "", None))
    cap_any = jnp.zeros(B, dtype=bool)

    def run_chain(a, n, cap_any, d):
        for strat in self.corrections:
            fn = self._get_pass2(strat, L, B)
            t0 = time.perf_counter()
            a, n, cap, aux = fn(self.table, a, n)
            jax.block_until_ready((a, n, cap, aux))
            percall.append((time.perf_counter() - t0, strat, L, B, d,
                            np.asarray(aux)))
            cap_any = cap_any | cap
        return a, n, cap_any

    a, n, cap_any = run_chain(a, n, cap_any, "fwd")
    if not two_side:
        a = _reverse_batch(a, n)
        a, n, cap_any = run_chain(a, n, cap_any, "rev")
        a = _reverse_batch(a, n)

    t0 = time.perf_counter()
    a_np = np.asarray(a)
    n_np = np.asarray(n)
    cap_np = np.asarray(cap_any)
    percall.append((time.perf_counter() - t0, "get", L, B, "", None))

    results = []
    fallback = [b for b in range(len(seqs)) if cap_np[b]]
    n_fallback[0] += len(fallback)
    fixed = {}
    if fallback:
        t0 = time.perf_counter()
        fb = self._oracle_correct_many([seqs[b] for b in fallback], two_side)
        fixed = dict(zip(fallback, fb))
        percall.append((time.perf_counter() - t0, "oracle",
                        L, len(fallback), "", None))
    for b, s in enumerate(seqs):
        results.append(fixed.get(b, a_np[b, : n_np[b]].tobytes()))
    return results


Tpu2Corrector._correct_chunk = patched

tc.correct_batch(reads, two_side=False)  # warm
percall.clear()
n_fallback[0] = 0
t0 = time.perf_counter()
tc.correct_batch(reads, two_side=False)
total = time.perf_counter() - t0
print(f"steady: {total:.2f}s  fallback_reads={n_fallback[0]}")
percall.sort(key=lambda x: -x[0])
for dt, what, L, B, d, aux in percall[:40]:
    extra = ""
    if aux is not None:
        extra = (f"sites={aux[0]} ovf={aux[1]} att={aux[2]} bnd={aux[3]} "
                 f"rnd={aux[4]} vis={aux[5]} rec={aux[6]} caplanes={aux[7]}")
    print(f"  {dt*1e3:9.1f} ms  {what:<8} L={L:>6} B={B:>4} {d:<3} {extra}")
