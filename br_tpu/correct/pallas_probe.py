"""Pallas TPU kernel: fused unpack + rolling k-mer + canonical + bitfield
probe over a flat 2-bit-packed chunk, with the solid bitfield resident in
VMEM.

Why: the measured XLA wall for the v3 engine is HBM gather throughput
(~8 ns/element against the 4 MiB k=13 bitfield; PERF_NOTES "Round-3 cost
model").  The k<=15 bitfield (<= 64 MiB raw, 4 MiB at the headline k=13)
fits VMEM (~16 MiB/core at k<=13), so one fused kernel can hold it
on-chip and emit the validity bitmap V plus the rolling k-mer array for a
whole tile without touching HBM per probe.  Reference semantics: the
dense precompute of engine3.make_pass3_fn step 1 (V bitmap), itself the
`KmerSet::get` contract of /root/reference/src/set.rs:17-21 applied at
every position.

Status: prototype behind `probe_chunk_pallas`; engine3 uses it only when
`BR_TPU_PALLAS=1` (keep/drop decision pending a chip microbench — Mosaic
per-lane vector gathers from VMEM are the open risk, see PERF_NOTES).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32

#: lanes per tile row; TPU vector lane width.
LANES = 128
#: tile rows processed per grid step (positions per step = SUB * LANES).
SUB = 64


def _revcomp32(x, k: int):
    # complement: A<->T (00<->10), C<->G (01<->11) = XOR 0b10 per base
    # (device_codec.comp_mask), then reverse the base pairs
    x = x ^ U32(int("10" * k, 2) & 0xFFFFFFFF)
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    x = (x << U32(16)) | (x >> U32(16))
    return x >> U32(32 - 2 * k)


def _canonical32(km, k: int):
    pc = jax.lax.population_count(km)
    even = (pc & U32(1)) == U32(0)
    return jnp.where(even, km, _revcomp32(km, k))


def _probe_kernel(k: int, CHUNK: int, packed_ref, table_ref, v_ref,
                  km_ref):
    """One grid step: SUB*LANES positions.

    packed_ref: (CHUNK//4,) u8 in VMEM (whole chunk; 64 KiB at 2^18)
    table_ref:  (2^(2k-1)/32,) u32 in VMEM (4 MiB at k=13)
    v_ref:      (SUB, LANES) i32 out tile (1 = valid)
    km_ref:     (SUB, LANES) u32 out tile (rolling k-mer ending here)
    """
    step = pl.program_id(0)
    P = SUB * LANES
    base = step * P

    idx = jax.lax.broadcasted_iota(I32, (SUB, LANES), 0) * LANES + \
        jax.lax.broadcasted_iota(I32, (SUB, LANES), 1) + base

    km = jnp.zeros((SUB, LANES), U32)
    for t in range(k):
        pos = idx - t
        posc = jnp.clip(pos, 0, CHUNK - 1)
        byte = packed_ref[posc // 4]
        code = (byte >> ((posc % 4) * 2).astype(jnp.uint8)) & jnp.uint8(3)
        km = km | (code.astype(U32) << U32(2 * t))
    # km currently has code[p-t] at bit 2t — i.e. newest base in the LOW
    # bits; the engine convention is newest base lowest?  engine packs
    # rolling_kmers32 with code[p] at bits 0..1 via (prev<<2)|code — the
    # OLDEST base highest.  Reproduce that: code[p-t] must sit at bits
    # 2t.  That is exactly what we built.
    cano = _canonical32(km, k)
    widx = (cano >> U32(1)) >> U32(5)
    bit = (cano >> U32(1)) & U32(31)
    w = table_ref[widx.astype(I32)]
    v = ((w >> bit) & U32(1)) == U32(1)
    v_ref[:, :] = v.astype(I32)
    km_ref[:, :] = km


try:  # pallas is optional at import time (CPU test envs)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnums=(2, 3))
def _probe_chunk_pallas(packed, table, k: int, interpret: bool):
    CHUNK = packed.shape[0] * 4
    P = SUB * LANES
    grid = CHUNK // P

    kern = functools.partial(_probe_kernel, k, CHUNK)
    v, km = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((grid * SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid * SUB, LANES), jnp.uint32),
        ),
        grid=(grid,),
        in_specs=[
            # whole chunk (64 KiB) + whole bitfield (4 MiB at k=13) live
            # in VMEM for the kernel's lifetime — the point of the design
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB, LANES), lambda i: (i, 0)),
            pl.BlockSpec((SUB, LANES), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(packed, table)
    return v.reshape(CHUNK) != 0, km.reshape(CHUNK)


def probe_chunk_pallas(packed, table, k: int, interpret: bool = False):
    """(V bitmap (CHUNK,), rolling k-mers (CHUNK,)) for a packed chunk.

    Positions p < k-1 wrap garbage into the register exactly like the
    XLA dense path (callers mask with `pin >= k-1`)."""
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    return _probe_chunk_pallas(packed, table, k, interpret)
