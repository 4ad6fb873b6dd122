"""Compile-time profile of the v2 pass program, per stage and strategy.

Compiles (never runs) each _stage variant on the CPU backend and reports
wall time + HLO module size, isolating which stage dominates compile cost.

    python scripts/compile_profile.py [strategy ...]
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct.engine2 import make_pass2_fn

K = 13
L = 9216          # the 8192 bucket
B = max(8, (1 << 21) // L)

table = jnp.zeros((1 << (2 * K - 1)) // 32, dtype=jnp.uint32)
packed = jnp.zeros((B, L // 4), dtype=jnp.uint8)
lens = jnp.full(B, L - 1024, dtype=jnp.int32)

strategies = sys.argv[1:] or ["one", "two", "graph", "greedy", "gap-size"]
for strat in strategies:
    print(f"== {strat}  (B={B}, L={L}) ==", flush=True)
    for stage in [1, 2, 3, 4, 5, 6, 7, 0]:
        fn = make_pass2_fn(K, strat, 5, 7, 5, B, L, "solid", _stage=stage)
        t0 = time.perf_counter()
        lowered = fn.lower(table, packed, lens)
        t_lower = time.perf_counter() - t0
        hlo = lowered.as_text()
        t0 = time.perf_counter()
        lowered.compile()
        t_comp = time.perf_counter() - t0
        print(f"  stage {stage or 'full'}: lower {t_lower:6.1f}s  "
              f"compile {t_comp:6.1f}s  hlo {len(hlo)/1e6:7.2f} MB",
              flush=True)
