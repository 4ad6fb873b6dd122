"""Instrument TpuCorrector.correct_batch end-to-end on the corpus."""

import time

import jax
import numpy as np

import br_tpu.correct.engine as eng
from br_tpu.correct.engine import TpuCorrector
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

tc = TpuCorrector(solid, CHAIN, confirm=5, max_search=7)

percall = []
timers = {"put": 0.0, "pass": 0.0, "get": 0.0, "oracle": 0.0, "n_cap": 0,
          "pass_calls": 0}

orig_chunk = TpuCorrector._correct_chunk


def patched_chunk(self, seqs, L, two_side):
    B = len(seqs)
    ascii_in = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for b, s in enumerate(seqs):
        ascii_in[b, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[b] = len(s)

    t0 = time.perf_counter()
    a = jax.device_put(ascii_in)
    n = jax.device_put(lens)
    jax.block_until_ready((a, n))
    timers["put"] += time.perf_counter() - t0

    import jax.numpy as jnp
    cap_any = jnp.zeros(B, dtype=bool)
    W_map = {s: eng._emit_words(s) for s in self.corrections}
    E_for = {s: max(W_map[s] * (L // 4 + 16), 64) for s in self.corrections}

    def run_chain(a, n, cap_any, direction):
        for strat in self.corrections:
            fn = self._get_pass(strat, L, E_for[strat])
            t0 = time.perf_counter()
            a, n, cap = fn(self.table, a, n)
            jax.block_until_ready((a, n, cap))
            dt = time.perf_counter() - t0
            timers["pass"] += dt
            timers["pass_calls"] += 1
            percall.append((dt, strat, L, B, direction))
            cap_any = cap_any | cap
        return a, n, cap_any

    a, n, cap_any = run_chain(a, n, cap_any, "fwd")
    if not two_side:
        a = eng._reverse_batch(a, n)
        a, n, cap_any = run_chain(a, n, cap_any, "rev")
        a = eng._reverse_batch(a, n)

    t0 = time.perf_counter()
    a_np = np.asarray(a)
    n_np = np.asarray(n)
    cap_np = np.asarray(cap_any)
    timers["get"] += time.perf_counter() - t0
    timers["n_cap"] += int(cap_np.sum())

    results = []
    t0 = time.perf_counter()
    for b, s in enumerate(seqs):
        if cap_np[b]:
            results.append(self._oracle_correct(s, two_side))
        else:
            results.append(a_np[b, : n_np[b]].tobytes())
    timers["oracle"] += time.perf_counter() - t0
    return results


TpuCorrector._correct_chunk = patched_chunk

# warm (compile)
t0 = time.perf_counter()
tc.correct_batch(reads, two_side=False)
print(f"warm run (compile): {time.perf_counter()-t0:.1f}s")

for k in timers:
    timers[k] = 0

percall.clear()
t0 = time.perf_counter()
tc.correct_batch(reads, two_side=False)
total = time.perf_counter() - t0
print(f"steady run: {total:.3f}s")
print(timers)
percall.sort(reverse=True)
for dt, strat, L, B, d in percall[:25]:
    print(f"  {dt*1e3:9.1f} ms  {strat:<9} L={L:>6} B={B:>4} {d}")
