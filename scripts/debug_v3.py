"""Single-read repro of an engine3 vs oracle mismatch (chain=['one'])."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from br_tpu.correct import build_methods
from br_tpu.correct.engine3 import make_pass3_fn
from br_tpu.set.solid import SolidSet

K = 13
CHUNK = 1 << 14
R = 32


def gen(seed=42, n_reads=16, err=3):
    rng = np.random.default_rng(seed)
    genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=4000).tobytes()
    reads = []
    for _ in range(n_reads):
        lo = rng.integers(0, 3600)
        ln = int(rng.integers(2 * K + 10, 400))
        r = bytearray(genome[lo : lo + ln])
        for _ in range(err):
            p = rng.integers(K + 2, len(r) - K - 2)
            op = rng.integers(3)
            if op == 0:
                r[p] = ord("ACTG"[rng.integers(4)])
            elif op == 1 and len(r) > 2 * K + 8:
                del r[p]
            else:
                r.insert(p, ord("ACTG"[rng.integers(4)]))
        reads.append(bytes(r))
    return genome, reads


def oracle_trace(method, seq):
    """Run the oracle scan with a repair log [(i, emit, consumed)]."""
    log = []
    orig = method.correct_error

    state = {"i": None}

    def hooked(kmer, suffix):
        res = orig(kmer, suffix)
        if res is not None:
            log.append((len(seq) - len(suffix), bytes(res[0]), res[1]))
        return res

    method.correct_error = hooked
    out = method.correct(seq)
    method.correct_error = orig
    return out, log


def main():
    genome, reads = gen()
    solid = SolidSet.from_sequences([genome], K)
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    seq = reads[target]
    print(f"read {target}: len={len(seq)}")

    methods = build_methods(["one"], solid, 5, 7)
    want, log = oracle_trace(methods[0], seq)
    print("oracle repairs (i, emit, consumed):", log)
    print("want:", want)

    fn = make_pass3_fn(K, "one", 5, 7, 5, CHUNK, R, _debug=True)
    codes = np.zeros(CHUNK, np.uint8)
    arr = np.frombuffer(seq, np.uint8)
    codes[: len(arr)] = (arr >> 1) & 3
    rstart = np.full(R, CHUNK, np.int32)
    rstart[0] = 0
    rlen = np.zeros(R, np.int32)
    rlen[0] = len(arr)
    b4 = codes.reshape(CHUNK // 4, 4)
    packed = (b4[:, 0] | (b4[:, 1] << 2) | (b4[:, 2] << 4)
              | (b4[:, 3] << 6))
    table = jax.device_put(solid.device_words())
    out, out_len, cap, aux, dbg = fn(table, packed,
                                     np.asarray(rstart), np.asarray(rlen))
    out = np.asarray(out)
    n = int(np.asarray(out_len)[0])
    oc = np.empty(CHUNK, np.uint8)
    for sh in range(4):
        oc[sh::4] = (out >> (2 * sh)) & 3
    got = np.frombuffer(b"ACTG", np.uint8)[oc[:n]].tobytes()
    print("got :", got)
    print("cap:", bool(np.asarray(cap)[0]), "aux:", np.asarray(aux))

    ns = int(np.asarray(dbg["n_sites"]))
    s_pos = np.asarray(dbg["s_pos"])[:ns]
    print("sites:", s_pos)
    print("succ_pos:", np.asarray(dbg["succ_pos"])[:ns])
    print("succ_idx:", np.asarray(dbg["succ_idx"])[:ns])
    print("visited:", np.asarray(dbg["visited"])[:ns].astype(int))
    print("s_cap:", np.asarray(dbg["s_cap"])[:ns])
    print("head_idx[0]:", int(np.asarray(dbg["head_idx"])[0]))
    rp = np.asarray(dbg["rp"]).reshape(-1, 8)[:ns]
    rc = np.asarray(dbg["rc"]).reshape(-1, 8)[:ns]
    rs = np.asarray(dbg["rs"]).reshape(-1, 8)[:ns]
    for s in range(ns):
        recs = [(int(p), int(cc), int(ss))
                for p, cc, ss in zip(rp[s], rc[s], rs[s]) if p < (1 << 30)]
        if recs:
            print(f"  site {s} @ {s_pos[s]}: records (pos,cnt,skip):",
                  recs)
    print("match:", got == want)


if __name__ == "__main__":
    main()
