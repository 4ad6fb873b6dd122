"""Pallas fused probe kernel vs the XLA dense path (interpret mode on
CPU; the chip path is exercised by the perf tooling)."""

import numpy as np
import pytest

import jax.numpy as jnp

from br_tpu.correct import device_codec as dc

pallas_probe = pytest.importorskip("br_tpu.correct.pallas_probe")


@pytest.mark.parametrize("k", [7, 13, 15])
def test_probe_chunk_matches_xla_dense(k):
    rng = np.random.default_rng(k)
    CHUNK = 1 << 14
    table = jnp.asarray(
        rng.integers(0, 1 << 32, 1 << (2 * k - 1 - 5), dtype=np.uint32))
    packed = jnp.asarray(rng.integers(0, 256, CHUNK // 4, dtype=np.uint8))

    codes = dc.unpack_codes(packed, CHUNK)
    km_ref = np.asarray(dc.rolling_kmers32(codes, k))
    v_ref = np.asarray(dc.make_solid_probe_any(table, k)(jnp.asarray(km_ref)))

    v, km = pallas_probe.probe_chunk_pallas(packed, table, k,
                                            interpret=True)
    # positions < k-1 hold wrap garbage in both paths; compare the rest
    assert np.array_equal(np.asarray(km)[k - 1:], km_ref[k - 1:])
    assert np.array_equal(np.asarray(v)[k - 1:], v_ref[k - 1:])
