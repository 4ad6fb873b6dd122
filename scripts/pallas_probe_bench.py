"""Pallas fused-probe prototype + on-chip microbench (NEGATIVE RESULT).

The hypothesis (PERF_NOTES "Architecture ceiling"): hold the k<=15 solid
bitfield in VMEM and fuse unpack + rolling k-mer + canonicalization +
bitfield probe in one kernel, removing the ~8 ns/elem HBM gather wall.

Measured outcome on the real chip (2026-08-20, jax 0.9.0, TPU v5e):
Mosaic rejects the kernel at lowering with "Cannot do int indexing on
TPU" — both the per-lane table probe `table_ref[widx]` and the packed
load `packed_ref[posc//4]`.  jax 0.9.0's Mosaic gather support is
exactly two `tpu.dynamic_gather` forms (same-shape 2-D operand/indices,
take-along-axis down sublanes or across lanes;
jax/_src/pallas/mosaic/lowering.py:2464-2524); a lane's probe index is
arbitrary over the 2^20-word table, so no axis-aligned form applies.
DECISION: drop — the kernel cannot lower on this stack; the XLA HBM
gather path stays.  The kernel below is kept here (NOT in the product
tree) so the semantics and the interpret-mode check survive for a future
jax whose Mosaic grows vector VMEM gathers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_probe_bench.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32
LANES = 128   # TPU vector lane width
SUB = 64      # tile rows per grid step


def _revcomp32(x, k: int):
    x = x ^ U32(int("10" * k, 2) & 0xFFFFFFFF)
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    x = (x << U32(16)) | (x >> U32(16))
    return x >> U32(32 - 2 * k)


def _canonical32(km, k: int):
    pc = jax.lax.population_count(km)
    return jnp.where((pc & U32(1)) == U32(0), km, _revcomp32(km, k))


def _probe_kernel(k: int, CHUNK: int, packed_ref, table_ref, v_ref, km_ref):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)
    P = SUB * LANES
    base = step * P
    idx = jax.lax.broadcasted_iota(I32, (SUB, LANES), 0) * LANES + \
        jax.lax.broadcasted_iota(I32, (SUB, LANES), 1) + base
    km = jnp.zeros((SUB, LANES), U32)
    for t in range(k):
        posc = jnp.clip(idx - t, 0, CHUNK - 1)
        byte = packed_ref[posc // 4]          # <- "Cannot do int indexing"
        code = (byte >> ((posc % 4) * 2).astype(jnp.uint8)) & jnp.uint8(3)
        km = km | (code.astype(U32) << U32(2 * t))
    cano = _canonical32(km, k)
    widx = (cano >> U32(1)) >> U32(5)
    bit = (cano >> U32(1)) & U32(31)
    w = table_ref[widx.astype(I32)]           # <- same rejection
    v_ref[:, :] = (((w >> bit) & U32(1)) == U32(1)).astype(I32)
    km_ref[:, :] = km


@functools.partial(jax.jit, static_argnums=(2, 3))
def probe_chunk_pallas(packed, table, k: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = packed.shape[0] * 4
    grid = CHUNK // (SUB * LANES)
    v, km = pl.pallas_call(
        functools.partial(_probe_kernel, k, CHUNK),
        out_shape=(jax.ShapeDtypeStruct((grid * SUB, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((grid * SUB, LANES), jnp.uint32)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((SUB, LANES), lambda i: (i, 0)),
                   pl.BlockSpec((SUB, LANES), lambda i: (i, 0))),
        interpret=interpret,
    )(packed, table)
    return v.reshape(CHUNK) != 0, km.reshape(CHUNK)


K = 13
CHUNK = 1 << 18
REPS = 5


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    from br_tpu.correct import device_codec as dc
    from br_tpu.set.solid import SolidSet

    @jax.jit
    def dense_xla(packed, table):
        codes = dc.unpack_codes(packed, CHUNK)
        kmers = dc.rolling_kmers32(codes, K)
        return dc.make_solid_probe_any(table, K)(kmers), kmers

    rng = np.random.default_rng(0)
    genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=200_000).tobytes()
    solid = SolidSet.from_sequences([genome], K)
    table = jax.device_put(solid.device_words())
    print("device:", jax.devices()[0])

    def fresh():
        codes = rng.integers(0, 4, CHUNK).astype(np.uint8)
        b4 = codes.reshape(CHUNK // 4, 4)
        return jax.device_put(b4[:, 0] | (b4[:, 1] << 2) | (b4[:, 2] << 4)
                              | (b4[:, 3] << 6))

    p0 = fresh()
    t0 = time.perf_counter()
    v_x, _ = dense_xla(p0, table)
    np.asarray(v_x)
    print(f"xla compile+run: {time.perf_counter() - t0:.1f}s")
    try:
        v_p, _ = probe_chunk_pallas(p0, table, K)
        np.asarray(v_p)
    except Exception as e:
        print(f"PALLAS FAILED on chip: {type(e).__name__} "
              f"(expected on jax 0.9.0 Mosaic: no vector VMEM gather)")
        return 0

    for name, fn in [("xla", dense_xla),
                     ("pallas", lambda p, t: probe_chunk_pallas(p, t, K))]:
        ts = []
        for _ in range(REPS):
            p = fresh()
            t0 = time.perf_counter()
            v, _ = fn(p, table)
            np.asarray(v)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:8s} best {best*1e3:8.2f} ms  "
              f"({CHUNK/best/1e6:7.1f} M probes/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
