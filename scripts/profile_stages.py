"""Cumulative per-stage timing of one v2 pass program on the real chip.

Builds make_pass2_fn with _stage = 1..7 plus the full pass (0) and times
each on the same (table, ascii, lens) chunk, so stage N - stage N-1 is the
marginal cost of that stage.  Run for each strategy of interest:

    python scripts/profile_stages.py [strategy] [bucket]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

from br_tpu.correct.engine2 import Tpu2Corrector, make_pass2_fn
from br_tpu.count import Counter
from br_tpu.io.fasta import read_records

REF_FASTA = "/root/reference/tests/data/raw.fasta"
K = 13
STRATEGY = sys.argv[1] if len(sys.argv) > 1 else "one"
BUCKET = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

reads = [seq for _d, seq, _q in read_records(REF_FASTA)]
counter = Counter(K)
for r in reads:
    counter.count_sequence(r)
solid = counter.to_solid(2)

tc = Tpu2Corrector(solid, [STRATEGY], confirm=5, max_search=7)

# assemble the chunk exactly like the driver would
idxs = [i for i, s in enumerate(reads)
        if tc._bucket_len2(len(s) + 8) == BUCKET]
L = BUCKET + max(64, BUCKET // 8)
B = min(tc.MAX_B, max(8, tc.TARGET_ELEMS // L))
idxs = idxs[:B]
print(f"strategy={STRATEGY} bucket={BUCKET} L={L} B={B} n={len(idxs)} "
      f"BL={B*L/1e6:.2f}M")
ascii_in = np.zeros((B, L), dtype=np.uint8)
lens = np.zeros(B, dtype=np.int32)
for b, i in enumerate(idxs):
    s = reads[i]
    ascii_in[b, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    lens[b] = len(s)
codes_arr = (ascii_in >> 1) & 3
# the relay memoizes identical dispatches: use a distinct input per call
variants = []
for v in range(4):
    av = codes_arr.copy()
    av[0, 0] = v  # distinct first base per variant
    b4 = av.reshape(B, L // 4, 4)
    packed = (b4[..., 0] | (b4[..., 1] << 2) | (b4[..., 2] << 4)
              | (b4[..., 3] << 6))
    variants.append((jax.device_put(packed), jax.device_put(lens)))

prev = 0.0
for stage in [1, 2, 3, 4, 5, 6, 7, 0]:
    fn = make_pass2_fn(K, STRATEGY, 5, 7, 5, B, L, "solid", _stage=stage)
    t0 = time.perf_counter()
    out = fn(tc.table, *variants[0])
    vals0 = [np.asarray(o) for o in out]  # force full round trip
    compile_s = time.perf_counter() - t0
    times = []
    for v in range(1, 4):
        t0 = time.perf_counter()
        out = fn(tc.table, *variants[v])
        vals = [np.asarray(o) for o in out]
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"  stage {stage or 'full'}: {best*1e3:8.1f} ms "
          f"(+{(best-prev)*1e3:7.1f} ms)  compile {compile_s:.1f}s")
    prev = best
