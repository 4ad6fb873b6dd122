"""Multi-host streaming (BASELINE config 5; SURVEY §5.8).

The reference's production pipeline is a single-node rayon fan-out with an
order-preserving collect (src/lib.rs:93-132).  The multi-host analog:

* ``jax.distributed.initialize`` builds the global runtime — every process
  owns its local devices, ``jax.devices()`` shows the global set, and
  collectives between processes ride DCN (ICI within a host).
* **Counting** — each process counts its input stripe into a WIDE (u32,
  non-saturating) partial count array; one ``psum`` over the global "dp"
  mesh merges them; the saturating-u8 pcon view is taken from the merged
  result (saturation is applied once, globally, so striping cannot change
  the threshold outcome).  Every process ends up with the identical solid
  set — the bitfield is replicated, never sharded.
* **Correction** — pure data parallelism over records: process ``p`` owns
  the round-robin stripe ``i % num_processes == p`` of the input order and
  corrects it with its local corrector (device or CPU backend).  Parts are
  written per process; the round-robin interleave of the part files is
  exactly the input order (the DCN-level analog of the rayon ordered
  collect, src/lib.rs:130-132).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger("br_tpu")


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_ids=None) -> None:
    """Join the global jax runtime (multi-host entry; SURVEY §5.8).

    On TPU pods the arguments are normally inferred from the environment
    and this reduces to ``jax.distributed.initialize()``; tests drive it
    explicitly on CPU processes."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh():
    """1-D "dp" mesh over ALL global devices (local + other hosts')."""
    import jax

    from br_tpu.parallel.mesh import data_parallel_mesh

    return data_parallel_mesh(jax.devices())


def count_stripe_merged(seqs, k: int, process_id: int, num_processes: int):
    """Count this process's record stripe, psum-merge across processes.

    Returns the replicated, merged u32 count array (every process gets
    identical values).  Requires ``initialize`` first (or a single
    process, where it degenerates to a local count)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from br_tpu.count import Counter

    local = Counter(k, count_dtype=np.uint32)
    for i, s in enumerate(seqs):
        if i % num_processes == process_id:
            local.count_sequence(s)

    if num_processes == 1:
        return local.counts

    mesh = global_mesh()
    n = local.counts.shape[0]
    d = jax.local_devices()[0]
    shard = jax.device_put(local.counts[None], d)
    garr = jax.make_array_from_single_device_arrays(
        (mesh.size, n), NamedSharding(mesh, P("dp", None)), [shard])

    @jax.jit
    def merge(a):
        return jnp.sum(a, axis=0, dtype=jnp.uint32)

    return np.asarray(merge(garr))


def part_path(output: str, process_id: int) -> str:
    return f"{output}.part{process_id}"


# ---------------------------------------------------------------------------
# Pod-grade streaming: contiguous byte-range striping (VERDICT r3 weak 7).
#
# Round-robin striping (run_correction_striped below) makes every process
# parse the ENTIRE input and the merge re-parse every part.  The pod design
# instead splits the input file into one contiguous byte range per process
# (ranges snapped forward to the next record start), so each process reads
# only ~1/P of the bytes, ranges balance *bytes* (a better proxy for work
# than record counts, with 157 b .. 62 kb reads), completion is a real DCN
# collective barrier instead of sentinel-file polling, and the merge is a
# raw byte concatenation of the parts in range order — no re-parse.
# Compressed inputs cannot seek; run_correction_ranged raises and the
# caller falls back to the striped path.
# ---------------------------------------------------------------------------


def fasta_range_bounds(path: str, process_id: int, num_processes: int):
    """[start, end) byte range of this process's stripe, snapped to record
    starts (a ``>`` at line start).  Plain (uncompressed) FASTA only."""
    with open(path, "rb") as fh:
        head = fh.read(2)
        if head[:2] in (b"\x1f\x8b", b"BZ"):
            raise ValueError("ranged striping needs an uncompressed input")
        # FASTQ would pass the compression check but '>' occurs inside
        # quality lines (Phred+33 Q29), so '\n>' snapping would split
        # records mid-stream; require a real FASTA head byte.
        if head[:1] != b">":
            raise ValueError(
                "ranged striping needs plain FASTA (file must start "
                "with '>'); use the striped path for FASTQ/compressed")
        fh.seek(0, os.SEEK_END)
        size = fh.tell()

        def snap(off: int) -> int:
            if off <= 0:
                return 0
            if off >= size:
                return size
            fh.seek(off - 1)
            prev = fh.read(1)
            pos = off
            while True:
                chunk = fh.read(1 << 20)
                if not chunk:
                    return size
                data = prev + chunk
                i = data.find(b"\n>")
                if i >= 0:
                    return pos - 1 + i + 1
                pos += len(chunk)
                prev = data[-1:]

        lo = snap(size * process_id // num_processes)
        hi = snap(size * (process_id + 1) // num_processes)
        return lo, hi


def _read_records_range(path: str, start: int, end: int):
    """Yield FASTA records whose byte offset lies in [start, end)."""
    from br_tpu.io.fasta import read_records

    if start >= end:
        return
    with open(path, "rb") as fh:
        fh.seek(start)
        definition = None
        seq_parts: list = []
        consumed = 0
        budget = end - start
        for line in fh:
            if consumed >= budget and line.startswith(b">"):
                break
            consumed += len(line)
            if line.startswith(b">"):
                if definition is not None:
                    yield (definition, b"".join(seq_parts), None)
                definition = line[1:].rstrip(b"\r\n")
                seq_parts = []
            else:
                seq_parts.append(line.strip())
            if consumed >= budget:
                # finish the current record (it may spill past `end`;
                # the snap guarantees no NEW record starts before it)
                for line2 in fh:
                    if line2.startswith(b">"):
                        break
                    seq_parts.append(line2.strip())
                break
        if definition is not None:
            yield (definition, b"".join(seq_parts), None)


def run_correction_ranged(
    input_path: str,
    output_path: str,
    valid_kmer,
    corrections: Sequence[str],
    confirm: int,
    max_search: int,
    two_side: bool,
    process_id: int,
    num_processes: int,
    backend: str = "auto",
    record_buffer: int = 8192,
    line_width: int = 80,
    barrier: bool = True,
) -> Optional[int]:
    """Correct this process's contiguous byte-range stripe.

    All processes rendezvous on a psum barrier over the global mesh (real
    collective backpressure, no polling); process 0 then concatenates the
    part files byte-for-byte in range order — identical to the
    single-process output because ranges partition the record sequence.
    Returns the total record count on process 0, None elsewhere."""
    from br_tpu.io.fasta import write_fasta_record
    from br_tpu.runtime import make_corrector

    lo, hi = fasta_range_bounds(input_path, process_id, num_processes)
    corrector = make_corrector(valid_kmer, corrections, confirm, max_search,
                               backend=backend)

    part = part_path(output_path, process_id)
    n_local = 0
    batch: list = []
    with open(part, "wb") as out:

        def flush():
            nonlocal n_local
            if not batch:
                return
            seqs = [s for (_d, s, _q) in batch]
            fixed = corrector.correct_batch(seqs, two_side)
            for (definition, _s, _q), f in zip(batch, fixed):
                write_fasta_record(out, definition, f, width=line_width)
                n_local += 1
            batch.clear()

        for rec in _read_records_range(input_path, lo, hi):
            batch.append(rec)
            if len(batch) >= record_buffer:
                flush()
        flush()

    # collective completion barrier + global record count (psum over the
    # global mesh rides DCN across hosts; no sentinel files, no polling)
    if barrier and num_processes > 1:
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = global_mesh()
        d = jax.local_devices()[0]
        shard = jax.device_put(np.asarray([n_local], np.int64), d)
        garr = jax.make_array_from_single_device_arrays(
            (mesh.size,), NamedSharding(mesh, P("dp")), [shard])
        total = int(np.asarray(jnp.sum(garr)))
    else:
        total = n_local

    if process_id != 0:
        return None

    with open(output_path, "wb") as out:
        for p in range(num_processes):
            with open(part_path(output_path, p), "rb") as src:
                while True:
                    buf = src.read(1 << 22)
                    if not buf:
                        break
                    out.write(buf)
    for p in range(num_processes):
        os.remove(part_path(output_path, p))
    log.info("multihost ranged merge: %d records from %d parts",
             total, num_processes)
    return total


def run_correction_striped(
    input_path: str,
    output_path: str,
    valid_kmer,
    corrections: Sequence[str],
    confirm: int,
    max_search: int,
    two_side: bool,
    process_id: int,
    num_processes: int,
    backend: str = "auto",
    record_buffer: int = 8192,
    line_width: int = 80,
    merge_timeout_s: float = 600.0,
) -> Optional[int]:
    """Correct this process's stripe; process 0 merges to ``output_path``.

    Every process streams the same input (cheap host-side parse), corrects
    only records ``i % num_processes == process_id``, and appends them to
    its part file in local order.  A ``.done`` sentinel marks completion;
    process 0 then interleaves the parts round-robin — byte-identical to
    the single-process output.  Returns the record count on process 0,
    None elsewhere."""
    from br_tpu.io.fasta import read_records, write_fasta_record
    from br_tpu.runtime import make_corrector

    corrector = make_corrector(valid_kmer, corrections, confirm, max_search,
                               backend=backend)

    part = part_path(output_path, process_id)
    batch: list = []
    with open(part, "wb") as out:

        def flush():
            if not batch:
                return
            seqs = [s for (_d, s, _q) in batch]
            fixed = corrector.correct_batch(seqs, two_side)
            for (definition, _s, _q), f in zip(batch, fixed):
                write_fasta_record(out, definition, f, width=line_width)
            batch.clear()

        for i, rec in enumerate(read_records(input_path)):
            if i % num_processes != process_id:
                continue
            batch.append(rec)
            if len(batch) >= record_buffer:
                flush()
        flush()
    with open(part + ".done", "w") as fh:
        fh.write("ok\n")

    if process_id != 0:
        return None

    # ---- order-preserving merge (round-robin interleave) ----------------
    deadline = time.monotonic() + merge_timeout_s
    parts = [part_path(output_path, p) for p in range(num_processes)]
    while not all(os.path.exists(p + ".done") for p in parts):
        if time.monotonic() > deadline:
            missing = [p for p in parts if not os.path.exists(p + ".done")]
            raise TimeoutError(f"multihost merge: parts not ready: {missing}")
        time.sleep(0.05)

    iters = [read_records(p) for p in parts]
    n = 0
    with open(output_path, "wb") as out:
        exhausted = [False] * num_processes
        while not all(exhausted):
            for p in range(num_processes):
                if exhausted[p]:
                    continue
                try:
                    definition, seq, _q = next(iters[p])
                except StopIteration:
                    exhausted[p] = True
                    continue
                write_fasta_record(out, definition, seq, width=line_width)
                n += 1
    for p in parts:
        os.remove(p)
        os.remove(p + ".done")
    log.info("multihost merge: %d records from %d parts", n, num_processes)
    return n
