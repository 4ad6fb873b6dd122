"""Per-iteration comparison: oracle greedy loop vs device greedy attempt."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

import br_tpu.correct.reference as ref
from br_tpu import codec
from br_tpu.correct import device_codec as dc
from br_tpu.correct.engine import make_greedy_attempt
from br_tpu.correct.alignment import global_align_ops
from br_tpu.set.solid import SolidSet

K = 13
rng = np.random.default_rng(42)


def random_genome(n):
    return bytes(rng.choice(list(b"ACTG"), size=n))


def mutate(read, nerr):
    b = bytearray(read)
    for _ in range(nerr):
        p = rng.integers(K + 2, len(b) - K - 2)
        op = rng.integers(3)
        if op == 0:
            b[p] = ord("ACTG"[rng.integers(4)])
        elif op == 1 and len(b) > 2 * K + 8:
            del b[p]
        else:
            b.insert(p, ord("ACTG"[rng.integers(4)]))
    return bytes(b)


genome = random_genome(4000)
solid = SolidSet.from_sequences([genome], K)
reads = []
for _ in range(24):
    lo = rng.integers(0, max(1, 4000 - 400))
    ln = int(rng.integers(2 * K + 10, 400))
    r = genome[lo : lo + ln]
    if len(r) >= K:
        reads.append(mutate(r, 3))

read = reads[6]
i_site = 47
seq = read[i_site:]
kmer = codec.seq2bit(read[i_site - K + 1 : i_site + 1])

g = ref.Greedy(solid, 7, 5)

# oracle loop with prints
alts = ref.alt_nucs(solid, kmer)
print("alts:", alts)
viewed = set()
local = bytearray()
before = codec.kmer2seq(kmer >> 2, K - 1)
wk = ref.add_nuc_to_end(kmer >> 2, alts[0], K)
local.append(codec.bit2nuc(alts[0]))
viewed.add(wk)
for it in range(7):
    step = g._follow_graph(wk)
    if step is not None:
        base, wk = step
        local.append(base)
    rv = wk in viewed
    viewed.add(wk)
    bound = len(seq) < it
    off = g._match_alignement(before, seq[:it], local)
    chk = g._check_next_kmers(wk, seq[it:]) if off is not None else None
    print(f"it={it} follow={'ok' if step else 'FAIL'} revisit={rv} "
          f"bound={bound} off={off} check={chk} path={bytes(local)!r}")
    if rv or bound:
        print("  -> oracle returns None here")
        break
    if off is not None and chk:
        print(f"  -> oracle ACCEPTS: consumed={len(local) + off}")
        break

# device attempt single-site
table = jax.device_put(solid.device_words())
probe = dc.make_solid_probe(table, K)
codes = dc.encode_ascii(jax.numpy.asarray(
    np.frombuffer(read, np.uint8)))
att = make_greedy_attempt(probe, codes, jax.numpy.int32(len(read)), K, 7, 5)
out = att(jax.numpy.int32(i_site), jax.numpy.uint64(kmer))
print("device attempt:", {f: np.asarray(getattr(out, f))
                          for f in out._fields})
