"""Device mesh plumbing: data-parallel sharding + sharded counting."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from br_tpu.correct import device_codec as dc


def data_parallel_mesh(devices=None) -> Mesh:
    """A 1-D "dp" mesh over all (or the given) devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("dp",))


def shard_batch(mesh: Mesh, ascii_batch, lens):
    """Place a padded (B, L) read batch sharded along B, lens alongside.

    B must be a multiple of the mesh size (the driver pads with empty
    lanes, which the engine skips in O(1))."""
    s_batch = NamedSharding(mesh, P("dp", None))
    s_lens = NamedSharding(mesh, P("dp"))
    return (jax.device_put(ascii_batch, s_batch),
            jax.device_put(lens, s_lens))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _count_local(ascii_batch, lens, k: int, half_space: int):
    """Scatter-add canonical k-mer counts for a local (B, L) shard.

    Saturation is applied at threshold time (counts are u32 here; the u8
    saturating view is produced by ``Counter``-compatible clipping)."""
    codes = dc.encode_ascii(ascii_batch)
    kmers = dc.rolling_kmers(codes, k)
    cano = dc.canonical(kmers, k)
    idx = (cano >> dc._u(1)).astype(jnp.int64)

    B, L = ascii_batch.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = (pos >= k - 1) & (pos < lens[:, None])
    # dump masked-out lanes onto a scratch bucket past the space
    idx = jnp.where(valid, idx, half_space)

    counts = jnp.zeros(half_space + 1, dtype=jnp.uint32)
    counts = counts.at[idx.reshape(-1)].add(1)
    return counts[:half_space]


def count_sharded(mesh: Mesh, ascii_batch, lens, k: int):
    """Count a batch across the mesh: local scatter-adds + one psum.

    Returns the replicated uint32 count array over the canonical
    half-space."""
    half_space = 1 << (2 * k - 1)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp", None), P("dp")), out_specs=P())
    def run(a_shard, l_shard):
        local = _count_local(a_shard, l_shard, k, half_space)
        return jax.lax.psum(local, "dp")

    a, l = shard_batch(mesh, ascii_batch, lens)
    return run(a, l)


def counts_to_u8(counts) -> np.ndarray:
    """pcon-compatible saturating-u8 view of a device count array."""
    return np.minimum(np.asarray(counts), 255).astype(np.uint8)
