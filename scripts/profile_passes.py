"""Profile per-(strategy, bucket) pass times on the real corpus."""

import time
from collections import defaultdict

import jax
import numpy as np

from br_tpu.correct.engine import (TpuCorrector, _bucket_len, _emit_words,
                                   make_pass_fn)
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
table = jax.device_put(solid.device_words())

# replicate the bucketing of correct_batch
order = np.argsort([len(s) for s in reads], kind="stable")
groups = defaultdict(list)
for idx in order:
    groups[_bucket_len(len(reads[idx]) + 8)].append(idx)

print(f"{'bucket':>8} {'L':>8} {'B':>5} strategy  compile_s  run_s")
total = 0.0
for bucket, idxs in sorted(groups.items()):
    L = bucket + max(64, bucket // 8)
    B_target = max(8, TpuCorrector.TARGET_ELEMS // L)
    chunk = idxs[:B_target]
    B = len(chunk)
    ascii_in = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for b, i in enumerate(chunk):
        s = reads[i]
        ascii_in[b, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[b] = len(s)
    a = jax.device_put(ascii_in)
    n = jax.device_put(lens)
    for strat in CHAIN:
        E = max(_emit_words(strat) * (L // 4 + 16), 64)
        fn = tc._get_pass(strat, L, E)
        t0 = time.perf_counter()
        out = fn(table, a, n)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(table, a, n)
        jax.block_until_ready(out)
        t_run = time.perf_counter() - t0
        total += t_run
        print(f"{bucket:>8} {L:>8} {B:>5} {strat:<9} {t_compile:>8.2f} "
              f"{t_run:>7.3f}")
print(f"total steady-state pass time (1 chunk/bucket, fwd only): {total:.2f}s")
