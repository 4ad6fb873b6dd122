"""Typed error layer — parity with the reference error enum.

Reference: ``src/error.rs:12-45`` — a thiserror enum with transparent
Log/RayonThreadPool/IO variants plus four message-bearing variants, and
``Result<T> = anyhow::Result<T>``.  Here the transparent variants map to
Python's native exceptions (logging config errors, ``OSError``); the
message-bearing variants get one class each with the reference's exact
message text, all under a common :class:`BrError` base so the CLI can
catch the whole family (the ``anyhow::Result`` analog).
"""

from __future__ import annotations


class BrError(Exception):
    """Base class of every typed br_tpu error (src/error.rs:12-16)."""


class ThreadPoolError(BrError):
    """Host worker-pool construction failed (src/error.rs:19-22,
    ``RayonThreadPool``)."""


class CsvMissingFirstColumn(BrError):
    """src/error.rs:28-30."""

    def __init__(self) -> None:
        super().__init__("Csv input not contains first column")


class ComputeAbundanceThreshold(BrError):
    """src/error.rs:32-34."""

    def __init__(self) -> None:
        super().__init__(
            "Br can't compute abundance threshold choose another method"
        )


class AbundanceThresholdOrAbundanceMethod(BrError):
    """src/error.rs:36-38."""

    def __init__(self) -> None:
        super().__init__(
            "In count and reads subcommand user should set minimum "
            "abundance or abundance selection method"
        )


class CountFileFormatError(BrError):
    """A count artifact failed structural validation (our own check —
    the reference trusts pcon's deserializer, src/main.rs:60-70).

    The on-disk format here is [inferred] ``gzip(k: u8 || counts)``; a
    genuine pcon file (or any foreign blob) must fail loudly instead of
    silently mis-loading as garbage counts (VERDICT r3 item 9)."""


class SolidRequireKmerSize(BrError):
    """src/error.rs:40-42."""

    def __init__(self) -> None:
        super().__init__(
            "In solid mode csv, fasta and fastq format require kmer size"
        )
