"""Generate golden corrected outputs for the bundled corpus (SURVEY §4
tier 2; VERDICT r2 item 6).

The Rust reference binary cannot be built in this image (no cargo), so the
goldens pin the CURRENT agreed semantics: the native C++ engine produces
each file and the scalar Python oracle must agree on a spot-check sample
(two independent implementations of src/correct/*.rs).  Any later
regression in either backend then fails tests/test_golden.py.

Configs: k=11 solid-asset mode and k=13 fasta-count mode, per strategy and
the full default chain (reference tests/br.rs:9-87 analog, but with pinned
bytes, which the reference's own tests lack).
"""

import gzip
import hashlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from br_tpu.correct import build_methods, correct_read
from br_tpu.count import Counter
from br_tpu.io.fasta import read_records
from br_tpu.native import NativeCorrector
from br_tpu.set.solid import SolidSet

REF = "/root/reference/tests/data"
OUT = "/root/repo/tests/golden"
CHAIN = ["one", "two", "graph", "greedy", "gap-size"]
SPOT = 24  # oracle spot-check sample size per config


def configs():
    reads = [s for _d, s, _q in read_records(f"{REF}/raw.fasta")]

    solid11 = SolidSet.load(f"{REF}/raw.k11.a2.solid")
    counter = Counter(13)
    for r in reads:
        counter.count_sequence(r)
    solid13 = counter.to_solid(2)

    for name, solid in (("k11.solid", solid11), ("k13.a2", solid13)):
        for strat in CHAIN:
            yield f"{name}.{strat}", solid, [strat], False
        yield f"{name}.chain", solid, CHAIN, False
    yield "k11.solid.chain.two-side", solid11, CHAIN, True


def main():
    os.makedirs(OUT, exist_ok=True)
    reads = [s for _d, s, _q in read_records(f"{REF}/raw.fasta")]
    index = {}
    for name, solid, methods, two_side in configs():
        nc = NativeCorrector(solid, methods, 5, 7)
        out = nc.correct_batch(reads, two_side=two_side)

        # oracle agreement spot-check (evenly spaced sample)
        oracle = build_methods(methods, solid, 5, 7)
        step = max(1, len(reads) // SPOT)
        for i in range(0, len(reads), step):
            want = correct_read(reads[i], oracle, two_side)
            assert out[i] == want, (name, i)

        blob = b"".join(s + b"\n" for s in out)
        path = f"{OUT}/{name}.txt.gz"
        with gzip.open(path, "wb", compresslevel=9) as fh:
            fh.write(blob)
        index[name] = {
            "sha256": hashlib.sha256(blob).hexdigest(),
            "n_reads": len(out),
            "n_bases": sum(map(len, out)),
        }
        print(f"{name}: {index[name]['n_bases']} bases, "
              f"sha256 {index[name]['sha256'][:16]}…")
    with open(f"{OUT}/index.json", "w") as fh:
        json.dump(index, fh, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
