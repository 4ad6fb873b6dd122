"""Measure v2 pass compile times per strategy/shape on the TPU backend."""

import sys
import time

import jax
import numpy as np

from br_tpu.correct.engine2 import make_pass2_fn
from br_tpu.set.solid import SolidSet

K = 13
rng = np.random.default_rng(0)
genome = rng.choice(np.frombuffer(b"ACTG", np.uint8), size=20000).tobytes()
solid = SolidSet.from_sequences([genome], K)
table = jax.device_put(solid.device_words())

shapes = [(256, 2304), (28, 73728)]
strategies = sys.argv[1:] or ["one", "two", "graph", "greedy", "gap-size"]

for B, L in shapes:
    ascii_in = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    ascii_in[0, :500] = np.frombuffer(genome[:500], np.uint8)
    lens[0] = 500
    for s in strategies:
        fn = make_pass2_fn(K, s, 5, 7, 5, B, L, "solid")
        t0 = time.perf_counter()
        lowered = fn.lower(table, ascii_in, lens)
        t_trace = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(table, ascii_in, lens)
        jax.block_until_ready(out)
        t_run = time.perf_counter() - t0
        print(f"B={B:>4} L={L:>6} {s:<9} trace={t_trace:6.1f}s "
              f"compile={t_comp:7.1f}s run={t_run*1e3:8.1f}ms", flush=True)
