"""The reference's planted-error unit-test catalog, as shared table data.

Ported verbatim from the reference module tests (it encodes the correction
semantics — SURVEY §4):

* one.rs:89-277, two.rs:344-642, graph.rs:93-318, greedy.rs:194-411,
  gap_size.rs:116-258.

Each case: (name, method, kwargs, k, refe, read, extra, expect) where

* ``refe``/``read`` may contain '-' padding which is stripped (the
  reference ``filter`` helper, one.rs:82-87),
* ``extra`` is a list of decoy sequences whose k-mers are also inserted
  ("relaxe"/branching variants),
* ``expect`` is "refe" (correction works) or "read" (corrector declines),
* every case additionally asserts correct(refe) == refe (no
  over-correction), except those listed in NO_REFE_CHECK.
"""

GREEDY_REFE = b"TAAGGCGCGTCCCGCACACATTTCGCTGCCCGATACGCAGATGAAAGAGG"


def filt(b: bytes) -> bytes:
    return bytes(c for c in b if c != ord("-"))


# (name, method, method_kwargs, k, refe, read, extra_seqs, expect)
CASES = [
    # --- One (one.rs:89-277), c=2 ------------------------------------------
    ("one_csc", "one", {"c": 2}, 5, b"ACTGACGAC", b"ACTGATGAC", [], "refe"),
    ("one_csc_relaxe", "one", {"c": 2}, 5, b"ACTGACCACT", b"ACTGATCACT",
     [b"ACTGACAC"], "refe"),
    ("one_cssc", "one", {"c": 2}, 5, b"ACTGACGAG", b"ACTGATAAG", [], "read"),
    ("one_cic", "one", {"c": 2}, 5, b"ACTGA-CGAC", b"ACTGATCGAC", [], "refe"),
    ("one_cic_relaxe", "one", {"c": 2}, 7, b"GAGCGTAC-GTTGGAT",
     b"GAGCGTACTGTTGGAT", [b"GCGTACGTGA"], "refe"),
    ("one_ciic", "one", {"c": 2}, 5, b"ACTGACGA", b"ACTGATTCGA", [], "read"),
    ("one_cdc", "one", {"c": 2}, 5, b"ACTGACGACCC", b"ACTGAGACCC", [], "refe"),
    ("one_cdc_relaxe", "one", {"c": 2}, 7, b"GAGCGTACGTTGGAT",
     b"GAGCGTAGTTGGAT", [b"GCGTACTT"], "refe"),
    ("one_cddc", "one", {"c": 2}, 5, b"ACTGACGAG", b"ACTGAAG", [], "read"),
    # --- Two (two.rs:344-642), c=2 except cicic ----------------------------
    ("two_short", "two", {"c": 2}, 5, b"CTGGTGCACTACCGGATAGG",
     b"-------ACTACCTG", [], "read"),
    ("two_ciic", "two", {"c": 2}, 5, b"GATACATGGA--CACTAGTATG",
     b"GATACATGGATTCACTAGTATG", [], "refe"),
    ("two_cisc", "two", {"c": 2}, 7, b"GATACATGGA-CACTAGTATG",
     b"GATACATGGATGACTAGTATG", [], "refe"),
    ("two_cssc", "two", {"c": 2}, 5, b"TCGTTATTCGGTGGACTCCT",
     b"TCGTTATTCGAAGGACTCCT", [], "refe"),
    ("two_csdc", "two", {"c": 2}, 5, b"AACAGCTGAATCTACCATTG",
     b"AACAGCTGAAGTACCATTG", [], "refe"),
    ("two_cddc", "two", {"c": 2}, 7, b"TGCCGTAGGCCATTGCGGCT",
     b"TGCCGTAGGC--TTGCGGCT", [], "refe"),
    ("two_cicic", "two", {"c": 3}, 7, b"ATAGTAACGG-A-CACACTT",
     b"ATAGTAACGGAAGCACACTT", [], "refe"),
    ("two_cicsc", "two", {"c": 2}, 7, b"GAGCCCAGAG-CGATATTCT",
     b"GAGCCCAGAGACTATATTCT", [], "refe"),
    ("two_cicdc", "two", {"c": 2}, 7, b"TCGAAAGCAT-GGGTACGTT",
     b"TCGAAAGCATAG-GTACGTT", [], "refe"),
    ("two_cscic", "two", {"c": 2}, 7, b"AAGGATGCATCG-ACTCAAG",
     b"AAGGATGCATGGAACTCAAG", [], "refe"),
    ("two_cscsc", "two", {"c": 2}, 7, b"ACACGTGCGCTTGGAGGTAC",
     b"ACACGTGCGCATCGAGGTAC", [], "refe"),
    ("two_cscdc", "two", {"c": 2}, 7, b"TATGCTCTGCGTAATCATAG",
     b"TATGCTCTGCAT-ATCATAG", [], "refe"),
    ("two_cdcic", "two", {"c": 2}, 7, b"GCTTCGTGATAG-TACGCTT",
     b"GCTTCGTGAT-GATACGCTT", [], "refe"),
    ("two_cdcsc", "two", {"c": 2}, 7, b"GGACCTGATCACGTCAATTA",
     b"GGACCTGATC-CCTCAATTA", [], "refe"),
    ("two_cdcdc", "two", {"c": 2}, 7, b"GGAATACGTGCGTTGGGTAA",
     b"GGAATACGTG-G-TGGGTAA", [], "refe"),
    # --- Graph (graph.rs:93-318) -------------------------------------------
    ("graph_branching_csc", "graph", {}, 5, b"TCTTTATTTTC", b"TCTTTGTTTTC",
     [b"TTTTT"], "read"),
    ("graph_branching_cdc", "graph", {}, 5, b"GATACATGGACACTAGTATG",
     b"GATACATGGAACTAGTATG", [b"GGACT"], "read"),
    ("graph_branching_cic", "graph", {}, 5, b"GATACATGGACACTAGTATG",
     b"GATACATGGATCACTAGTATG", [b"GGACT"], "read"),
    ("graph_csc", "graph", {}, 5, b"TCTTTATTTTC", b"TCTTTGTTTTC", [], "refe"),
    ("graph_cssc", "graph", {}, 5, b"TCTCTAATCTTC", b"TCTCTGGTCTTC", [], "refe"),
    ("graph_csssc", "graph", {}, 5, b"TCTCTAAATCTTC", b"TCTCTGGGTCTTC", [], "refe"),
    ("graph_cscsc", "graph", {}, 5, b"TCTTTACATTTTT", b"TCTTTGCGTTTTT", [], "refe"),
    ("graph_cdc", "graph", {}, 5, b"GATACATGGACACTAGTATG",
     b"GATACATGGAACTAGTATG", [], "refe"),
    ("graph_cddc", "graph", {}, 5, b"CAAAGCATTTTT", b"CAAAGTTTTT", [], "refe"),
    ("graph_cic", "graph", {}, 5, b"GATACATGGACACTAGTATG",
     b"GATACATGGATCACTAGTATG", [], "refe"),
    ("graph_ciic", "graph", {}, 5, b"GATACATGGACACTAGTATG",
     b"GATACATGGATTCACTAGTATG", [], "refe"),
    # --- Greedy (greedy.rs:194-411), k=11, max_search=7, nb_validate=2 ------
    # NOTE: the reference's own assertions expect the READ unchanged in every
    # non-ignored case ("test correction work" compares against read).
    ("greedy_branching_csc", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCACTGCCCGATACGCAGATGAAAGAGG",
     [b"CACATTTCGCG"], "read"),
    ("greedy_branching_cdc", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCCTGCCCGATACGCAGATGAAAGAGG",
     [b"CACATTTCGCG"], "read"),
    ("greedy_branching_cic", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCAGCTGCCCGATACGCAGATGAAAGAGG",
     [b"CACACATTTCT"], "read"),
    ("greedy_csc", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCACTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    ("greedy_cssc", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTGACTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    ("greedy_csssc", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTGATTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    ("greedy_cscsc", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTGATTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    ("greedy_cic", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCAGCTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    ("greedy_ciic", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCAAGCTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    ("greedy_ciiic", "greedy", {"max_search": 7, "nb_validate": 2}, 11,
     GREEDY_REFE, b"TAAGGCGCGTCCCGCACACATTTCAAAGCTGCCCGATACGCAGATGAAAGAGG",
     [], "read"),
    # --- GapSize (gap_size.rs:116-258), c=2 --------------------------------
    ("gap_csc", "gap-size", {"c": 2}, 5, b"AGCGTATCTT", b"AGCGTTTCTT", [], "refe"),
    ("gap_cssc", "gap-size", {"c": 2}, 5, b"TCTCTAATCTTC", b"TCTCTGGTCTTC", [], "refe"),
    ("gap_csssc", "gap-size", {"c": 2}, 5, b"TCTCTAAATCTTC", b"TCTCTGGGTCTTC", [], "refe"),
    ("gap_cscsc", "gap-size", {"c": 2}, 11,
     b"GTGTGACTTACACCTCGTTGAGCACCCGATGTTGGTATAGTCCGAACAAC",
     b"GTGTGACTTACACCTCGTTGAGTAGCCGATGTTGGTATAGTCCGAACAAC", [], "refe"),
    ("gap_cdc", "gap-size", {"c": 2}, 5, b"GATACATGGACACTAGTATG",
     b"GATACATGGAACTAGTATG", [], "refe"),
    ("gap_cddc", "gap-size", {"c": 2}, 5, b"CAAAGCATTTTT", b"CAAAGTTTTT", [], "refe"),
    ("gap_cic", "gap-size", {"c": 2}, 5, b"GGATAACTCT", b"GGATATACTCT", [], "refe"),
]

#: Cases whose reference test does NOT assert correct(refe) == refe.
NO_REFE_CHECK = {"two_short"}


def build_oracle_corrector(method: str, kwargs: dict, valid_kmer):
    from br_tpu.correct import reference as R

    if method == "one":
        return R.One(valid_kmer, kwargs["c"])
    if method == "two":
        return R.Two(valid_kmer, kwargs["c"])
    if method == "graph":
        return R.Graph(valid_kmer)
    if method == "greedy":
        return R.Greedy(valid_kmer, kwargs["max_search"], kwargs["nb_validate"])
    if method == "gap-size":
        return R.GapSize(valid_kmer, kwargs["c"])
    raise ValueError(method)


def build_case_set(k: int, refe: bytes, extra):
    from br_tpu import codec
    from br_tpu.set.solid import SolidSet

    s = SolidSet(k)
    for seq in [refe, *extra]:
        for kmer in codec.tokenize(seq, k):
            s.set(kmer, True)
    return s
