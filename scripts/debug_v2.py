"""Trace/compile/run one tiny v2 pass and time each phase."""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

from br_tpu.correct.engine2 import make_pass2_fn
from br_tpu.set.solid import SolidSet

K = 13
B, L = 4, 128
strategy = sys.argv[1] if len(sys.argv) > 1 else "one"

rng = np.random.default_rng(0)
genome = bytes(rng.choice(list(b"ACTG"), size=600))
solid = SolidSet.from_sequences([genome], K)

reads = [genome[10:110], genome[200:300]]
ascii_in = np.zeros((B, L), np.uint8)
lens = np.zeros(B, np.int32)
for i, r in enumerate(reads):
    ascii_in[i, : len(r)] = np.frombuffer(r, np.uint8)
    lens[i] = len(r)

table = jax.device_put(solid.device_words())

t0 = time.perf_counter()
fn = make_pass2_fn(K, strategy, 5, 7, 5, B, L, "solid")
lowered = fn.lower(table, ascii_in, lens)
print(f"trace: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
out, out_len, cap, aux = compiled(table, ascii_in, lens)
jax.block_until_ready((out, out_len, cap))
print(f"run: {time.perf_counter()-t0:.3f}s", flush=True)
print("out_len:", np.asarray(out_len), "cap:", np.asarray(cap),
      "aux:", np.asarray(aux))
for i, r in enumerate(reads):
    got = np.asarray(out)[i, : int(out_len[i])].tobytes()
    print(f"read{i}: in=out: {got == r} (clean read, expect True)")
