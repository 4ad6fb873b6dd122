"""Differential-test engine2 vs the native engine on the real corpus.

Usage: corpus_v2.py [n_reads] [backend=cpu|axon]
"""

import os
import sys

if len(sys.argv) > 2 and sys.argv[2] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import time

import numpy as np

from br_tpu.correct.engine2 import Tpu2Corrector
from br_tpu.count import Counter
from br_tpu.io.fasta import read_records
from br_tpu.native import NativeCorrector

REF_FASTA = "/root/reference/tests/data/raw.fasta"
K = 13
CHAIN = ["one", "two", "graph", "greedy", "gap-size"]

n_limit = int(sys.argv[1]) if len(sys.argv) > 1 else 206

reads = [seq for _d, seq, _q in read_records(REF_FASTA)][:n_limit]
counter = Counter(K)
for r in reads:
    counter.count_sequence(r)
solid = counter.to_solid(2)

nc = NativeCorrector(solid, CHAIN, 5, 7)
t0 = time.perf_counter()
want = nc.correct_batch(reads, two_side=False)
t_cpu = time.perf_counter() - t0

tc = Tpu2Corrector(solid, CHAIN, confirm=5, max_search=7)
t0 = time.perf_counter()
got = tc.correct_batch(reads, two_side=False)
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
got = tc.correct_batch(reads, two_side=False)
t_dev = time.perf_counter() - t0

bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
print(f"reads={len(reads)} mismatches={len(bad)} "
      f"cpu={t_cpu:.2f}s warm={t_compile:.1f}s steady={t_dev:.2f}s "
      f"speedup={t_cpu/t_dev:.2f}x")
for i in bad[:5]:
    g, w, r = got[i], want[i], reads[i]
    d = next((j for j in range(min(len(g), len(w))) if g[j] != w[j]),
             min(len(g), len(w)))
    print(f"  read {i}: len_in={len(r)} got={len(g)} want={len(w)} "
          f"first_diff@{d}")
sys.exit(1 if bad else 0)
