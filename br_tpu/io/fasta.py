"""FASTA/FASTQ streaming + compression autodetect.

* ``open_maybe_compressed`` sniffs gzip / bzip2 / xz magic bytes and returns
  a binary stream (the ``niffler`` equivalent, reference src/cli.rs:400-420).
* ``read_records`` streams ``(definition, sequence, quality)`` tuples from
  FASTA or FASTQ, autodetected from the first byte ('>' vs '@'), preserving
  the definition line verbatim (the reference writes
  ``record.definition().clone()`` back out, src/lib.rs:57-60).
* Malformed trailing records are dropped silently, mirroring the
  reference's ``while let Some(Ok(record))`` pattern (src/lib.rs:35).
* Writers emit FASTA wrapped at ``width`` bases (noodles' default of 80) or
  single-line with ``width=0``.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
from typing import BinaryIO, Iterator, Optional, Tuple

Record = Tuple[bytes, bytes, Optional[bytes]]  # (definition, seq, quality)


def open_maybe_compressed(path: str) -> BinaryIO:
    """Open a file, transparently decompressing gz/bz2/xz by magic bytes."""
    with open(path, "rb") as fh:
        magic = fh.read(6)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(path, "rb")
    if magic[:3] == b"BZh":
        return bz2.open(path, "rb")
    if magic[:6] == b"\xfd7zXZ\x00":
        return lzma.open(path, "rb")
    return open(path, "rb")


def read_records(source) -> Iterator[Record]:
    """Yield records from a FASTA or FASTQ path/stream (format autodetected)."""
    stream = open_maybe_compressed(source) if isinstance(source, str) else source
    first = stream.read(1)
    if not first:
        return
    if first == b">":
        yield from _read_fasta(stream)
    elif first == b"@":
        yield from _read_fastq(stream)
    else:
        raise ValueError("input is neither FASTA ('>') nor FASTQ ('@')")


def _read_fasta(stream: BinaryIO) -> Iterator[Record]:
    """Stream FASTA records; the leading '>' of the first record was consumed."""
    definition = stream.readline().rstrip(b"\r\n")
    seq_parts: list[bytes] = []
    for line in stream:
        if line.startswith(b">"):
            yield definition, b"".join(seq_parts), None
            definition = line[1:].rstrip(b"\r\n")
            seq_parts = []
        else:
            seq_parts.append(line.strip())
    yield definition, b"".join(seq_parts), None


def _read_fastq(stream: BinaryIO) -> Iterator[Record]:
    """Stream 4-line FASTQ records; leading '@' of the first was consumed."""
    definition = stream.readline().rstrip(b"\r\n")
    while True:
        seq = stream.readline().rstrip(b"\r\n")
        plus = stream.readline()
        qual = stream.readline().rstrip(b"\r\n")
        if not plus:
            return  # truncated record: drop silently
        yield definition, seq, qual
        nxt = stream.readline()
        if not nxt:
            return
        if not nxt.startswith(b"@"):
            return  # malformed: drop the rest
        definition = nxt[1:].rstrip(b"\r\n")


def write_fasta_record(out: BinaryIO, definition: bytes, seq: bytes,
                       width: int = 80) -> None:
    out.write(b">" + definition + b"\n")
    if width <= 0 or len(seq) <= width:
        out.write(seq + b"\n")
    else:
        for i in range(0, len(seq), width):
            out.write(seq[i : i + width] + b"\n")


def write_fastq_record(out: BinaryIO, definition: bytes, seq: bytes,
                       qual: bytes) -> None:
    out.write(b"@" + definition + b"\n" + seq + b"\n+\n" + qual + b"\n")
