"""Reverse-pass statistics: sites + segment structure on reversed reads."""

import numpy as np

from br_tpu import codec
from br_tpu.count import Counter
from br_tpu.io.fasta import read_records

REF_FASTA = "/root/reference/tests/data/raw.fasta"
K = 13

reads = [seq for _d, seq, _q in read_records(REF_FASTA)]
counter = Counter(K)
for r in reads:
    counter.count_sequence(r)
solid = counter.to_solid(2)

for label, xform in (("fwd", lambda r: r), ("rev", lambda r: r[::-1])):
    edges = 0
    valid = 0
    total = 0
    max_edges_per_read = 0
    for r in reads:
        r = xform(r)
        if len(r) < K:
            continue
        codes = codec.encode_ascii_np(np.frombuffer(r, np.uint8))
        kmers = codec.rolling_kmers_np(codes, K)
        v = solid.get_many(kmers)
        e = int(np.sum(v[:-1] & ~v[1:]))
        edges += e
        max_edges_per_read = max(max_edges_per_read, e)
        valid += int(v.sum())
        total += len(v)
    print(f"{label}: valid {valid/total*100:5.2f}%  edges {edges} "
          f"({edges/total*100:.2f}% of positions)  max/read {max_edges_per_read}")
