"""End-to-end pipeline + CLI tests (reference tests/br.rs analog)."""

import gzip
import io
import sys

import pytest

from br_tpu.cli import main
from br_tpu.io.fasta import read_records, write_fasta_record

REF_DATA = "/root/reference/tests/data"

FASTA = (b">r1 first\nACTGACGACCCTTGCA\n"
         b">r2 second\nACTGACGACCCTTGCA\nACTGACGACCCTTGCA\n")


def test_read_records_fasta_multiline():
    recs = list(read_records(io.BytesIO(FASTA)))
    assert recs[0] == (b"r1 first", b"ACTGACGACCCTTGCA", None)
    assert recs[1][1] == b"ACTGACGACCCTTGCA" * 2


def test_read_records_fastq():
    fq = b"@r1 x\nACGT\n+\n!!!!\n@r2\nTTTT\n+\nIIII\n"
    recs = list(read_records(io.BytesIO(fq)))
    assert recs == [(b"r1 x", b"ACGT", b"!!!!"), (b"r2", b"TTTT", b"IIII")]


def test_compression_autodetect(tmp_path):
    p = tmp_path / "x.fa.gz"
    p.write_bytes(gzip.compress(FASTA))
    recs = list(read_records(str(p)))
    assert len(recs) == 2


def test_write_wraps_at_width():
    buf = io.BytesIO()
    write_fasta_record(buf, b"r", b"A" * 100, width=80)
    assert buf.getvalue() == b">r\n" + b"A" * 80 + b"\n" + b"A" * 20 + b"\n"
    buf = io.BytesIO()
    write_fasta_record(buf, b"r", b"A" * 100, width=0)
    assert buf.getvalue() == b">r\n" + b"A" * 100 + b"\n"


def _run_cli(tmp_path, backend, argv_extra=(), n_reads=6):
    """Plant one substitution per read, correct with the solid-from-fasta
    mode, expect restoration."""
    refe = b"GTGTGACTTACACCTCGTTGAGCACCCGATGTTGGTATAGTCCGAACAAC"
    reads = []
    for i in range(n_reads):
        r = bytearray(refe)
        r[20] = ord(b"T")  # plant substitution (refe[20] == 'G')
        reads.append(bytes(r))

    inp = tmp_path / "reads.fa"
    with open(inp, "wb") as fh:
        for i, r in enumerate(reads):
            fh.write(b">read%d\n%s\n" % (i, r))
    ref = tmp_path / "ref.fa"
    ref.write_bytes(b">ref\n" + refe + b"\n")
    out = tmp_path / "out.fa"

    rc = main([
        "-i", str(inp), "-o", str(out),
        "-c", "one", "--backend", backend, "--line-width", "0",
        *argv_extra,
        "solid", "-f", "fasta", "-i", str(ref), "-k", "11",
    ])
    assert rc == 0
    got = list(read_records(str(out)))
    assert len(got) == len(reads)
    for d, seq, _q in got:
        assert seq == refe
    return got


def test_cli_end_to_end_oracle(tmp_path):
    _run_cli(tmp_path, "oracle")


def test_cli_fasta_mode_counts_and_corrects(tmp_path):
    """fasta subcommand: set built by counting the reads themselves."""
    refe = b"GTGTGACTTACACCTCGTTGAGCACCCGATGTTGGTATAGTCCGAACAAC"
    # 5 clean copies (count>2 => solid) + 1 erroneous read
    bad = bytearray(refe)
    bad[25] = ord(b"A")
    inp = tmp_path / "reads.fa"
    with open(inp, "wb") as fh:
        for i in range(5):
            fh.write(b">c%d\n%s\n" % (i, refe))
        fh.write(b">bad\n%s\n" % bytes(bad))
    out = tmp_path / "out.fa"

    rc = main([
        "-i", str(inp), "-o", str(out), "-c", "one", "--backend", "oracle",
        "--line-width", "0",
        "fasta", "-i", str(inp), "-k", "11", "-a", "2",
    ])
    assert rc == 0
    got = list(read_records(str(out)))
    assert got[-1][1] == refe  # the bad read was fixed


def test_definition_preserved_verbatim(tmp_path):
    inp = tmp_path / "in.fa"
    inp.write_bytes(b">weird header  with\tstuff extra=1\nACTGACGACCCTTGCA\n")
    out = tmp_path / "out.fa"
    rc = main([
        "-i", str(inp), "-o", str(out), "-c", "one", "--backend", "oracle",
        "solid", "-f", "fasta", "-i", str(inp), "-k", "11",
    ])
    assert rc == 0
    d, _s, _q = next(read_records(str(out)))
    assert d == b"weird header  with\tstuff extra=1"


def test_fastq_input_writes_fasta_output(tmp_path):
    """The reference always writes FASTA records, even for FASTQ input
    (src/lib.rs:30-31,121-127)."""
    refe = b"GTGTGACTTACACCTCGTTGAGCACCCGATGTTGGTATAGTCCGAACAAC"
    inp = tmp_path / "reads.fq"
    inp.write_bytes(b"@r0 comment\n" + refe + b"\n+\n" + b"I" * len(refe)
                    + b"\n")
    ref = tmp_path / "ref.fa"
    ref.write_bytes(b">ref\n" + refe + b"\n")
    out = tmp_path / "out.fa"
    rc = main([
        "-i", str(inp), "-o", str(out), "-c", "one", "--backend", "oracle",
        "--line-width", "0",
        "solid", "-f", "fasta", "-i", str(ref), "-k", "11",
    ])
    assert rc == 0
    data = out.read_bytes()
    assert data == b">r0 comment\n" + refe + b"\n"


def test_threads_flag_reaches_native_pool(tmp_path, monkeypatch):
    """-t sizes the host worker pool (ref src/main.rs:30-33)."""
    import br_tpu.runtime as runtime

    seen = {}
    real = runtime.make_corrector

    def spy(valid_kmer, corrections, confirm, max_search, backend="auto",
            threads=0):
        seen["threads"] = threads
        return real(valid_kmer, corrections, confirm, max_search,
                    backend="oracle")

    monkeypatch.setattr(runtime, "make_corrector", spy)
    _run_cli(tmp_path, "oracle", argv_extra=("-t", "3"))
    assert seen["threads"] == 3


def test_native_pool_uses_threads():
    from br_tpu.native import NativeCorrector
    from br_tpu.set.solid import SolidSet

    s = SolidSet.from_sequences([b"ACTGACGACCCTTGCA"], 11)
    nc = NativeCorrector(s, ["one"], 5, 7, threads=2)
    assert nc._pool._max_workers == 2


def test_timestamp_flag_formats_log(tmp_path, capsys):
    """-T adds timestamps to stderr logging (ref src/main.rs:27)."""
    import logging

    from br_tpu.cli import configure_logging

    configure_logging(quiet=False, verbosity=1, timestamp="ms")
    logging.getLogger("br_tpu").info("hello-stamped")
    err = capsys.readouterr().err
    assert "hello-stamped" in err
    import re

    assert re.search(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3} ", err)
    # reset to no-timestamp default so later tests are unaffected
    configure_logging(quiet=True, verbosity=0, timestamp="none")


def test_stage_timers_and_report(tmp_path, caplog):
    """In-product profiling: stage timers accumulate and report at -v."""
    import logging as _logging

    from br_tpu import profiling

    profiling.reset_stages()
    _run_cli(tmp_path, "oracle", argv_extra=("-v",))
    totals = profiling.stage_totals()
    assert "build-set" in totals and "correct" in totals and "write" in totals
    calls, secs = totals["correct"]
    assert calls >= 1 and secs >= 0.0
