"""Per-strategy, per-direction cap/visit/apply diagnostics on the corpus.

Prints the aux counters of every v3 pass (sites, cap reasons, visited,
applied, capped reads) for the forward and reverse chains — the tool that
found the 70%-fallback WALK_MAX diagnosis and the tier-2 overflow bug in
round 4.  Runs on whatever backend jax picks (TPU when present; set
JAX_PLATFORMS=cpu and BR_TPU_JAX_CACHE for a cached CPU run).
"""

import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("BR_TPU_JAX_CACHE", os.path.expanduser("~/.cache/br_tpu_jax"))
import numpy as np, jax

from br_tpu.correct.engine3 import Tpu3Corrector
from br_tpu.count import Counter
from br_tpu.io.fasta import read_records

K = 13
reads = [s for _d, s, _q in read_records("/root/reference/tests/data/raw.fasta")]
counter = Counter(K)
for r in reads:
    counter.count_sequence(r)
solid = counter.to_solid(2)
tc = Tpu3Corrector(solid, ["one","two","graph","greedy","gap-size"], 5, 7)
tc.warmup(two_side=False, parallel=False)
print("warm", flush=True)

impure = set()
plans = tc._plan(reads, impure)
_up = tc._get_unpack()
dev = [(_up(jax.device_put(a)), jax.device_put(rs), jax.device_put(rl))
       for a, rs, rl in (tc._chunk_arrays(reads, i, s) for i, s in plans)]
rev = tc._get_reverse()

names = ["sites","cap_overflow","cap_attempt","cap_rounds","visited","applied","capped_reads","raw_sites"]
for direction in ("fwd","rev"):
    tot = {}
    state = []
    for ci, (a, rs, n) in enumerate(dev):
        cur_a, cur_n = a, n
        capped = np.zeros(0)
        for s in tc.corrections:
            fn = tc._get_pass(s)
            cur_a, cur_n, cap, aux = fn(tc.table, cur_a, rs, cur_n)[:4]
            aux = np.asarray(aux)
            tot.setdefault(s, np.zeros(8, np.int64))
            tot[s] += aux
        cur_a = rev(cur_a, rs, cur_n)
        state.append((cur_a, rs, cur_n))
    for s in tc.corrections:
        d = dict(zip(names, tot[s]))
        print(direction, s, {k2: int(v) for k2, v in d.items() if v}, flush=True)
    dev = state
