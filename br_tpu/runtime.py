"""Pipeline runtime: stream records, batch, correct, ordered write-back.

Reference: ``run_correction`` (src/lib.rs:72-139) — read ``record_buffer``
records, fan the batch out (rayon there; a TPU batch or the native CPU
backend here), then write corrected records back in input order.

Backends:

* ``oracle`` — the scalar Python reference implementation (exact, slow).
* ``jax``    — the batched TPU engine (br_tpu.correct.engine), reads
  bucketed by length, device-resident bitfield, edit-list splicing.
* ``native`` — the C++ CPU engine (br_tpu/native), the CPU baseline.

All backends produce identical bytes (enforced by tests/test_pipeline.py).
"""

from __future__ import annotations

import logging
import sys
from typing import Iterable, Optional, Sequence

from br_tpu import DEFAULT_RECORD_BUFFER
from br_tpu.correct import build_methods, correct_read
from br_tpu.io.fasta import read_records, write_fasta_record
from br_tpu.profiling import stage

log = logging.getLogger("br_tpu")


def _batches(records: Iterable, size: int):
    buf = []
    for rec in records:
        buf.append(rec)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def run_correction(
    inputs: Sequence,
    outputs: Sequence,
    valid_kmer,
    corrections: Sequence[str],
    confirm: int,
    max_search: int,
    two_side: bool,
    record_buffer: int = DEFAULT_RECORD_BUFFER,
    backend: str = "auto",
    line_width: int = 80,
    threads: int = 0,
) -> int:
    """Correct every record of every (input, output) pair; returns #records.

    ``inputs`` / ``outputs`` are paths or streams, zipped pairwise like the
    reference (src/lib.rs:79).  ``threads`` sizes the host worker pool of
    the CPU backends (0 = all cores), mirroring the reference's rayon pool
    (src/main.rs:30-33); device backends ignore it.
    """
    corrector = make_corrector(
        valid_kmer, corrections, confirm, max_search, backend=backend,
        threads=threads,
    )

    n = 0
    for source, sink in zip(inputs, outputs):
        own_sink = isinstance(sink, str)
        out = open(sink, "wb") if own_sink else sink
        try:
            for batch in _batches(read_records(source), record_buffer):
                log.info("correcting batch of %d records", len(batch))
                seqs = [seq for (_d, seq, _q) in batch]
                with stage("correct"):
                    corrected = corrector.correct_batch(seqs, two_side)
                with stage("write"):
                    for (definition, _seq, _qual), fixed in zip(batch,
                                                                corrected):
                        # The reference always writes FASTA records, even
                        # for FASTQ input (src/lib.rs:30-31,121-127).
                        write_fasta_record(out, definition, fixed,
                                           width=line_width)
                        n += 1
        finally:
            if own_sink:
                out.close()
            elif hasattr(out, "flush"):
                out.flush()
    return n


def make_corrector(valid_kmer, corrections, confirm, max_search,
                   backend="auto", threads=0):
    """Pick a batch corrector backend."""
    if backend == "auto":
        try:
            from br_tpu.correct.engine3 import Tpu3Corrector  # noqa: F401

            backend = "jax"
        except Exception:  # pragma: no cover - jax always present in CI
            backend = "oracle"
    if backend == "jax":
        # v3 (flat-packed, one program per strategy) for the headline
        # k range with a solid bitfield; v2 (bucketed) otherwise.
        from br_tpu.correct.engine3 import Tpu3Corrector
        from br_tpu.set.solid import SolidSet

        if valid_kmer.k <= 17 and isinstance(valid_kmer, SolidSet):
            return Tpu3Corrector(valid_kmer, corrections, confirm,
                                 max_search)
        backend = "jax-v2"
    if backend == "jax-v2":
        from br_tpu.correct.engine2 import Tpu2Corrector

        return Tpu2Corrector(valid_kmer, corrections, confirm, max_search)
    if backend == "native":
        from br_tpu.native import NativeCorrector

        return NativeCorrector(valid_kmer, corrections, confirm, max_search,
                               threads=threads)
    if backend == "oracle":
        return OracleCorrector(valid_kmer, corrections, confirm, max_search)
    raise ValueError(f"unknown backend {backend!r}")


class OracleCorrector:
    """Scalar reference backend (one read at a time)."""

    def __init__(self, valid_kmer, corrections, confirm, max_search):
        self.methods = build_methods(corrections, valid_kmer, confirm, max_search)

    def correct_batch(self, seqs: Sequence[bytes], two_side: bool):
        return [correct_read(seq, self.methods, two_side) for seq in seqs]


def stdio_streams(input_paths: Optional[Sequence[str]],
                  output_paths: Optional[Sequence[str]]):
    """Default to stdin/stdout when -i/-o are omitted (src/cli.rs:80-113)."""
    ins = list(input_paths) if input_paths else [sys.stdin.buffer]
    outs = list(output_paths) if output_paths else [sys.stdout.buffer]
    return ins, outs
