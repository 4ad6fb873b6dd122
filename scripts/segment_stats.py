"""Host-side stats: attempt-site density and resync-split opportunities."""

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

MIN_RUN = 2 * K + 12  # resync window: k + ms + c + slack

edges_tot = 0
seg_lens = []
for r in reads:
    if len(r) < K:
        continue
    codes = codec.encode_ascii_np(np.frombuffer(r, np.uint8))
    kmers = codec.rolling_kmers_np(codes, K)
    v = solid.get_many(kmers)  # validity of kmer ending at p (p >= K-1)
    edges = np.sum(v[:-1] & ~v[1:])
    edges_tot += edges
    # maximal valid runs
    vv = np.concatenate([[False], v, [False]])
    d = np.diff(vv.astype(np.int8))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]
    runs = ends - starts
    # split points: one per valid run of length >= MIN_RUN
    splits = starts[runs >= MIN_RUN] + K + 10
    bounds = np.concatenate([[0], splits, [len(r)]])
    seg_lens.extend(np.diff(bounds).tolist())

seg_lens = np.array(seg_lens)
n_bases = sum(map(len, reads))
print(f"reads={len(reads)} bases={n_bases}")
print(f"valid->invalid edges total={edges_tot} "
      f"({edges_tot/n_bases*100:.2f}% of bases)")
print(f"segments={len(seg_lens)} mean={seg_lens.mean():.0f} "
      f"median={np.median(seg_lens):.0f} p90={np.percentile(seg_lens,90):.0f} "
      f"p99={np.percentile(seg_lens,99):.0f} max={seg_lens.max()}")
for cap in (128, 192, 256, 384, 512, 1024):
    frac = (seg_lens <= cap).mean()
    pad = (np.minimum(seg_lens, cap).sum() + (seg_lens > cap).sum() * 0
           ) / (len(seg_lens) * cap)
    print(f"  cap={cap:>5}: {frac*100:5.1f}% segments fit; "
          f"fill-ratio if padded to cap: {np.minimum(seg_lens,cap).mean()/cap:.2f}")
