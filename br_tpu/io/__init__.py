"""Host IO: FASTA/FASTQ streaming with transparent decompression.

Equivalent of the reference's ``noodles`` (parse/write, src/lib.rs:30-31)
and ``niffler`` (gz/bz2/xz autodetect, src/cli.rs:404-420) dependencies.
A C++ fast path for FASTA parsing/batch assembly lives in ``br_tpu/native``
(loaded via ctypes when built; these pure-Python readers are the fallback
and the semantics reference).
"""

from br_tpu.io.fasta import (  # noqa: F401
    open_maybe_compressed,
    read_records,
    write_fasta_record,
    write_fastq_record,
)
