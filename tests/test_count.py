"""Counter + spectrum + CLI plumbing tests."""

import io

import numpy as np
import pytest

from br_tpu import codec
from br_tpu.cli import build_parser, round_down_odd
from br_tpu.count import Counter, Spectrum, ThresholdMethod


def test_counter_saturates():
    c = Counter(5)
    kmers = np.full(300, codec.canonical(codec.seq2bit(b"ACGTA"), 5), dtype=np.uint64)
    c.add_kmers(kmers)
    idx = codec.canonical(codec.seq2bit(b"ACGTA"), 5) >> 1
    assert c.raw()[idx] == 255  # saturating u8, like pcon's count_u8


def test_counter_counts_and_thresholds():
    c = Counter(5)
    c.count_sequence(b"ACGTACGTACGT")  # repeated kmers
    solid0 = c.to_solid(0)  # count > 0
    solid9 = c.to_solid(200)
    assert solid0.get(codec.seq2bit(b"ACGTA"))
    assert not solid9.get(codec.seq2bit(b"ACGTA"))


def test_counter_roundtrip(tmp_path):
    c = Counter(5)
    c.count_sequence(b"ACGTACGGGTACGT")
    p = str(tmp_path / "c.pcon")
    c.save(p)
    loaded = Counter.load(p)
    assert loaded.k == 5
    assert np.array_equal(loaded.raw(), c.raw())


def test_spectrum_first_minimum():
    # classic shape: error peak at 1, dip at 3, coverage peak at 8
    hist = np.array([0, 100, 40, 10, 20, 40, 60, 80, 90, 50, 10])
    assert Spectrum(hist).get_threshold(ThresholdMethod.FIRST_MINIMUM) == 3


def test_spectrum_percent_rules():
    hist = np.array([0, 60, 20, 10, 10])  # total 100
    s = Spectrum(hist)
    # >=a tails: a=1:100, a=2:40, a=3:20, a=4:10
    assert s.get_threshold(ThresholdMethod.PERCENT_AT_LEAST, 0.35) == 2
    assert s.get_threshold(ThresholdMethod.PERCENT_AT_MOST, 0.25) == 3
    assert s.get_threshold(ThresholdMethod.RAREFACTION, 0.15) == 3


def test_spectrum_empty_returns_none():
    assert Spectrum(np.zeros(5, dtype=int)).get_threshold(
        ThresholdMethod.FIRST_MINIMUM) is None


def test_cli_even_k_rounds_down():
    """src/cli.rs:277-279 + the ported expectation 14 -> 13 (cli.rs:459)."""
    assert round_down_odd(14) == 13
    assert round_down_odd(13) == 13
    assert round_down_odd(2) == 1


def test_cli_defaults():
    args = build_parser().parse_args(["fasta", "-i", "x.fa", "-k", "13"])
    assert args.confirm == 5
    assert args.max_search == 7
    assert args.record_buffer == 8192
    assert args.corrections is None
    assert not args.two_side
    assert args.subcommand == "fasta"


def test_cli_abundance_selection_subcommand():
    args = build_parser().parse_args(
        ["fasta", "-i", "x.fa", "-k", "13", "rarefaction", "0.1"])
    assert args.abundance_selection == "rarefaction"
    assert args.percent == pytest.approx(0.1)
