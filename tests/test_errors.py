"""Typed error layer (reference src/error.rs:12-45)."""

import io

import pytest

from br_tpu.cli import main
from br_tpu.errors import (
    AbundanceThresholdOrAbundanceMethod,
    BrError,
    ComputeAbundanceThreshold,
    CsvMissingFirstColumn,
    SolidRequireKmerSize,
)
from br_tpu.set.solid import SolidSet


def test_messages_match_reference():
    assert str(AbundanceThresholdOrAbundanceMethod()) == (
        "In count and reads subcommand user should set minimum abundance "
        "or abundance selection method")
    assert str(ComputeAbundanceThreshold()) == (
        "Br can't compute abundance threshold choose another method")
    assert str(CsvMissingFirstColumn()) == (
        "Csv input not contains first column")
    assert str(SolidRequireKmerSize()) == (
        "In solid mode csv, fasta and fastq format require kmer size")
    for cls in (AbundanceThresholdOrAbundanceMethod, ComputeAbundanceThreshold,
                CsvMissingFirstColumn, SolidRequireKmerSize):
        assert issubclass(cls, BrError)


def test_missing_abundance_method_exits_1(tmp_path, capsys):
    inp = tmp_path / "in.fa"
    inp.write_bytes(b">r\nACTGACGACCCTTGCA\n")
    rc = main(["-i", str(inp), "-o", str(tmp_path / "o.fa"),
               "fasta", "-i", str(inp), "-k", "11"])
    assert rc == 1
    assert "abundance selection method" in capsys.readouterr().err


def test_solid_requires_kmer_size(tmp_path, capsys):
    inp = tmp_path / "in.fa"
    inp.write_bytes(b">r\nACTGACGACCCTTGCA\n")
    rc = main(["-i", str(inp), "-o", str(tmp_path / "o.fa"),
               "solid", "-f", "fasta", "-i", str(inp)])
    assert rc == 1
    assert "require kmer size" in capsys.readouterr().err


def test_csv_missing_first_column():
    with pytest.raises(CsvMissingFirstColumn):
        SolidSet.from_csv(io.StringIO("kmer,count\n,3\n"), 11)


def test_compute_abundance_threshold_path(tmp_path, capsys):
    """A spectrum with no computable threshold raises the typed error."""
    import numpy as np

    from br_tpu.cli import _threshold
    from br_tpu.count import Counter

    class FakeCounter:
        def raw(self):
            return np.zeros(2 ** 21, dtype=np.uint8)  # empty spectrum

    with pytest.raises(ComputeAbundanceThreshold):
        _threshold(FakeCounter(), None, "first-minimum", None)
