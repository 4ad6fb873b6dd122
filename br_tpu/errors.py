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


class SolidRequireKmerSize(BrError):
    """src/error.rs:40-42."""

    def __init__(self) -> None:
        super().__init__(
            "In solid mode csv, fasta and fastq format require kmer size"
        )
