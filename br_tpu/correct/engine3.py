"""The v3 TPU correction engine: flat-packed, u32-pure, one program per
strategy.

Third redesign of the batched corrector, driven by two r2/r3 findings:

* **Compile wall** — the v2 bucketed engine compiles one program per
  (strategy, length-bucket, batch) triple; the corpus needs ~30 programs
  (XLA pathology: ANY u64 op in a module holding a computed-operand
  gather inflates compile time ~15x; see scripts/compile_isolate*.py).
  v3 packs every read of a chunk into ONE flat position buffer with a
  per-read (start, len) table, so each strategy is a single compiled
  program reused for every batch, and all k-mer math is uint32.  The
  u32 walk machinery needs a sentinel value above every real k-mer, so
  v3 natively covers k <= 15 in u32 registers and k = 17 in u64
  (the largest odd k whose solid bitfield fits HBM: 1 GiB); larger k
  falls back to the v2 engine.
* **Pad waste** — 2x length buckets waste ~25-50% of every chunk; flat
  packing wastes only the per-read splice slack (~12%).

Structure per pass (one strategy, one direction, ONE jitted program):

1. **Dense precompute** — rolling u32 k-mers over u8 codes, per-position
   read geometry via delta-scatter + cumsum fills (r5: the only
   CHUNK-sized HBM gathers a pass pays are the bitfield probe and the
   final splice gather; every stepwise-constant per-position table is a
   scatter of per-boundary deltas integrated by cumsum — measured ~13x
   cheaper than gathers and ~50x cheaper than cummax fills on this
   XLA/TPU stack, scripts/op_patterns.py), validity bitmap V (one
   bitfield gather per position) gated by per-read bounds, transition
   bitmap T, next-valid/next-transition jump tables (flat reverse-
   cummin; every consumer bound-checks against its read end, so reads
   never leak into each other).
2. **Site-block queue** — attempt sites (rank r extracted on demand via
   binary search over cumsum(T)) and nested dirty re-attempts are
   processed in BLK-lane blocks inside one ``while_loop`` whose trip
   count scales with the ACTUAL work (ceil(items/BLK)), not a static
   capacity.  Each block: the exactly-one-alternative gate, the
   strategy attempt (scenario tables are straight-line vector code; the
   de Bruijn walks are two-tier while_loops whose trip count is the max
   walk length), the post-repair dirty-window simulation (k unrolled
   probes), and record/successor writes.  New pending items append to
   the queue.
3. **Whole-read chain walk** — which sites the scan machine actually
   visits is decided by a gather-only pointer-doubling descent over the
   site-successor graph from each read's head site (successor site ids
   are recovered in O(1) from cumsum(T), no sort).  v2's mid-read
   resync boundaries and their runtime crossing guard are gone.
4. **Splice** — one unified per-position source index: src = pos - S,
   where the per-segment shift S (covering verbatim spans, emit spans
   pointing into a concatenated unpacked-emit table, and tails) is a
   single delta-scatter + cumsum fill; the output is assembled with ONE
   combined gather from concat(input codes, emit table).

Reference semantics: the scan machine of
/root/reference/src/correct/mod.rs:53-107 with the strategy ladder of
src/correct/ (see br_tpu.correct.reference for the full restatement).
Every engineered bound (site/queue/record/walk capacity) raises a
per-read ``cap`` flag; capped reads are re-corrected exactly on the
host (native C++ engine), so output is always bit-exact vs the
reference semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct import device_codec as dc

I32 = jnp.int32
U32 = jnp.uint32
U8 = jnp.uint8

#: de Bruijn walk cap (engine.py MAX_WALK parity).  An ENGINEERING
#: bound, not reference semantics (graph.rs walks are unbounded):
#: accepts/fills longer than the profile's walk_max CAP, and capped
#: reads retry on a wide-profile chain before the host oracle (r5).
WALK_MAX = 248
#: 2-bit bases per u32 emit word.
BPW = 16
#: emit words per walk record: WALK_MAX+1 bases.
EW_WALK = (WALK_MAX + 1 + BPW - 1) // BPW
#: tier-1 walk ring (full history; see engine2 T1_STEPS discussion).
RING = 32
#: tier-1 walk step budget: <= RING-2, so the tier-1 ring holds the FULL
#: visited history (exact revisit detection, graph.rs:71-75).
T1_STEPS = 30
#: tier-2 walk history width (start + up to WALK_MAX visited k-mers).
NH2 = 256
#: tier-2 walk lane capacity per block.
NW2 = 256


class WalkProfile(NamedTuple):
    """Engineering bounds of the de Bruijn walk machinery (per pass
    program).  The default profile covers virtually every real-corpus
    walk; the WIDE profile re-runs the rare reads whose accepts/fills
    out-emit the default buffer (fallback_capped -> 0 on device)."""

    walk_max: int   # steps before a walk CAPs (tier-2 bound)
    ew: int         # emit words per walk record (walk_max+1 bases)
    nh2: int        # tier-2 history width (>= walk_max+1 for exactness)
    nw2: int        # tier-2 lane width (history compare costs
    #                 O(nw2*nh2) PER STEP — the wide profile narrows
    #                 lanes to keep long walks affordable)


def walk_profile(walk_max: int) -> WalkProfile:
    return WalkProfile(walk_max,
                       (walk_max + 1 + BPW - 1) // BPW,
                       walk_max + 8,
                       NW2 if walk_max <= WALK_MAX else 32)


DEFAULT_WP = walk_profile(WALK_MAX)
#: wide-retry profile (engineering headroom for long unique-path
#: accepts and long gap fills; reads that out-emit even this cap to the
#: host oracle).
WIDE_WALK_MAX = 2040
#: chain records per site (applied repairs in one dirty chain).
SLOTS = 8
#: site-block width for the adaptive queue loop.
BLK = 2048

BIG = np.int32(1 << 30)
NEG_INF = np.int32(-(1 << 20))
#: u32 sentinel for walk histories; above every k-mer because k <= 15.
SENT32 = np.uint32(0xFFFFFFFF)


def _sent(k: int):
    """All-ones walk-history sentinel in the register dtype (above every
    2k-bit k-mer)."""
    return SENT32 if k <= 15 else np.uint64(0xFFFFFFFFFFFFFFFF)

# traceback layer codes (greedy DP)
OP_MATCH, OP_SUBST, OP_DEL, OP_INS, TB_START = 0, 1, 2, 3, 4

# walk / queue status codes
RUN, ACCEPT, DECLINE, CAP = 0, 1, 2, 3
DONE_PURE, DONE_END, PENDING = 0, 1, 2

# per-site cap reason codes (aux diagnostics)
CAP_OVERFLOW, CAP_ATTEMPT, CAP_ROUNDS = 1, 2, 4


def _u(x):
    return jnp.uint32(x)


def reg_dtype(k: int):
    """Register dtype for the rolling k-mer: u32 through k=15 (2k+sentinel
    fits 32 bits), u64 beyond (k=17 is the largest odd k whose solid
    bitfield still fits HBM: 2^33 bits = 1 GiB)."""
    return U32 if k <= 15 else jnp.uint64


def _mask(k: int):
    return reg_dtype(k)((1 << (2 * k)) - 1)


def add_nuc32(kmer, code, k: int):
    """Rolling k-mer update; dtype follows the register (u32 for k <= 15,
    u64 for k = 17)."""
    t = kmer.dtype.type
    return ((kmer << t(2)) & t((1 << (2 * k)) - 1)) ^ code.astype(kmer.dtype)


def _check_k(k: int):
    if not (1 <= k <= 17):
        raise ValueError(
            f"engine3 requires k <= 17 (a solid bitfield that fits HBM); "
            f"got k={k}.  Use the v2 engine (hash set) for larger k.")


def _code_at(codes, idx):
    return codes[jnp.clip(idx, 0, codes.shape[0] - 1)]


def _lower_bound(arr, q):
    """First index i with arr[i] >= q, branchless; arr sorted, 1-D."""
    n = arr.shape[0]
    levels = max(1, (n).bit_length())
    pos = jnp.zeros(jnp.shape(q), dtype=I32)
    for level in reversed(range(levels)):
        cand = pos + (1 << level)
        ok = (cand <= n) & (arr[jnp.clip(cand - 1, 0, n - 1)] < q)
        pos = jnp.where(ok, cand, pos)
    return pos


def _compact(mask, fields, cap: int, fill=0, with_src: bool = False):
    """Compact `fields` (arrays over the mask axis) to `cap` slots.

    Returns (compacted fields, slot-valid mask, overflow mask over the
    ORIGINAL axis[, source indices])."""
    cum = jnp.cumsum(mask.astype(I32), dtype=I32)
    total = cum[-1]
    src = _lower_bound(cum, jnp.arange(1, cap + 1, dtype=I32))
    srcc = jnp.clip(src, 0, mask.shape[0] - 1)
    ok = jnp.arange(cap, dtype=I32) < jnp.minimum(total, cap)
    out = []
    for f in fields:
        g = f[srcc]
        out.append(jnp.where(ok.reshape((cap,) + (1,) * (g.ndim - 1)),
                             g, jnp.asarray(fill, dtype=g.dtype)))
    overflow = mask & (cum > cap)
    if with_src:
        return out, ok, overflow, srcc
    return out, ok, overflow


def _rcummin(a):
    return jnp.flip(jax.lax.cummin(jnp.flip(a, -1), axis=a.ndim - 1), -1)


class AttemptOut3(NamedTuple):
    """Per-site attempt result (u32 k-mers / emit words)."""

    ok: jax.Array        # correction applies
    new_kmer: jax.Array  # u32 register after replaying emitted bases
    consumed: jax.Array  # i32 input positions to skip
    emit: jax.Array      # (EW,) u32 words, 16 2-bit bases each, LSB-first
    cnt: jax.Array       # i32 emitted base count
    cap: jax.Array       # engineered bound hit -> host oracle fallback


#: the default br method chain; `fused=True` (opt-in, experimental —
#: NOT reference semantics, see make_ladder_attempt32) collapses exactly
#: this chain into one per-site ladder pass program.
LADDER_CHAIN = ("one", "two", "graph", "greedy", "gap-size")


def emit_words(strategy: str, ew_walk: int = EW_WALK) -> int:
    return {"one": 1, "two": 1, "greedy": 1,
            "graph": ew_walk, "gap-size": ew_walk,
            "ladder": ew_walk}[strategy]


# ---------------------------------------------------------------------------
# Scenario attempts (One / Two / Greedy), scalar-per-site (vmapped by the
# caller).  Ports of engine.make_*_attempt with uint32 k-mers and u32 emit
# words; semantics cited there (exist/one.rs, exist/two.rs, greedy.rs).
# ---------------------------------------------------------------------------


def _alt_info32(probe, kmer):
    """'Exactly one alternative last base' gate (mod.rs:114-116)."""
    base = (kmer >> _u(2)) << _u(2)
    cands = base ^ jnp.arange(4, dtype=U32)
    ok = probe(cands)
    n = jnp.sum(ok.astype(I32), dtype=I32)
    alt = jnp.sum(jnp.arange(4, dtype=U32) * ok.astype(U32), dtype=U32)
    return n, base ^ alt


def make_one_attempt32(probe, codes, k: int, c: int):
    """One-error scenarios I/S/D (exist/one.rs + exist/mod.rs:120-149)."""

    def attempt(i, kmer, length):
        rem = length - i
        nalts, corr = _alt_info32(probe, kmer)
        corr_ok = probe(corr)

        keep = []
        one_more = []
        for off in (0, 1, 2):
            km = corr
            valids = []
            for t in range(c + 1):
                km = add_nuc32(km, _code_at(codes, i + off + t), k)
                valids.append(probe(km))
            score_ok = (off + c <= rem) & corr_ok
            for t in range(c):
                score_ok = score_ok & valids[t]
            keep.append(score_ok)
            one_more.append((rem > c + off + 1) & valids[c])

        keep = jnp.stack(keep)          # D(0), S(1), I(2)
        one_more = jnp.stack(one_more)
        nk = jnp.sum(keep.astype(I32), dtype=I32)
        keep2 = keep & one_more
        nk2 = jnp.sum(keep2.astype(I32), dtype=I32)

        sel = jnp.where(nk == 1, keep, keep2)
        ok = (nalts == 1) & ((nk == 1) | ((nk > 1) & (nk2 == 1)))
        offset = jnp.sum(jnp.arange(3, dtype=I32) * sel.astype(I32), dtype=I32)

        emit = jnp.zeros(1, dtype=U32).at[0].set(
            (corr & _u(3)).astype(U32))
        return AttemptOut3(ok, corr, offset, emit, jnp.int32(1),
                           jnp.bool_(False))

    return attempt


def make_one_attempt32_arr(probe, codes, k: int, c: int):
    """Array-form One attempt (exist/one.rs): same semantics as the
    vmapped scalar form, but the per-step code reads collapse into ONE
    (N, c+3) window gather and all candidate probes into ONE batched
    probe — the queue body is op-count-floor-bound (~16 us per small
    gather on the relay), so ~40 little gathers -> ~3 matters more than
    element counts."""
    CL = codes.shape[0]

    def attempt(i, kmer, length):
        rem = length - i
        nalts, corr = _alt_info32_arr(probe, kmer)

        win = codes[jnp.clip(
            i[:, None] + jnp.arange(c + 3, dtype=I32)[None, :],
            0, CL - 1)]                                  # (N, c+3)

        # prospective registers for the three scenarios (off = D0/S1/I2):
        # km_{off,t} = corr after absorbing win[off .. off+t]
        cands = [corr]                                   # corr_ok row
        for off in (0, 1, 2):
            km = corr
            for t in range(c + 1):
                km = add_nuc32(km, win[:, off + t], k)
                cands.append(km)
        vall = probe(jnp.stack(cands))                   # (1+3*(c+1), N)
        corr_ok = vall[0]

        keep, one_more = [], []
        row = 1
        for off in (0, 1, 2):
            valids = [vall[row + t] for t in range(c + 1)]
            row += c + 1
            score_ok = (off + c <= rem) & corr_ok
            for t in range(c):
                score_ok = score_ok & valids[t]
            keep.append(score_ok)
            one_more.append((rem > c + off + 1) & valids[c])

        keep = jnp.stack(keep)                           # D(0), S(1), I(2)
        one_more = jnp.stack(one_more)
        nk = jnp.sum(keep.astype(I32), axis=0, dtype=I32)
        keep2 = keep & one_more
        nk2 = jnp.sum(keep2.astype(I32), axis=0, dtype=I32)

        sel = jnp.where(nk == 1, keep, keep2)
        ok = (nalts == 1) & ((nk == 1) | ((nk > 1) & (nk2 == 1)))
        offset = jnp.sum(jnp.arange(3, dtype=I32)[:, None]
                         * sel.astype(I32), axis=0, dtype=I32)

        emit = ((corr & _u(3)).astype(U32))[:, None] * jnp.ones(
            (1, 1), U32)
        return AttemptOut3(ok, corr, offset, emit,
                           jnp.ones_like(offset),
                           jnp.zeros(ok.shape, bool))

    return attempt


def make_two_attempt32(probe, codes, k: int, c: int):
    """The 13 two-error scenarios (exist/two.rs) as a masked parallel
    evaluation (engine.make_two_attempt, uint32)."""

    def attempt(i, kmer, length):
        rem = length - i
        nalts, corr = _alt_info32(probe, kmer)

        def absorb(km, idx):
            return add_nuc32(km, _code_at(codes, idx), k)

        def alt_next(km):
            cands = jnp.stack([add_nuc32(km, jnp.uint8(a), k)
                               for a in range(4)])
            okv = probe(cands)
            n = jnp.sum(okv.astype(I32), dtype=I32)
            alt = jnp.sum(jnp.arange(4, dtype=U32) * okv.astype(U32), dtype=U32)
            return n == 1, add_nuc32(km, alt.astype(jnp.uint8), k)

        def alt_last(km):
            n, repl = _alt_info32(probe, km)
            return n == 1, repl

        scen = {}
        t1 = absorb(corr, i + 1)
        t1_valid = probe(t1)

        scen["II"] = (jnp.bool_(True), corr)
        scen["IS"] = (jnp.bool_(True), corr)
        u, km2 = alt_last(t1)
        scen["SS"] = ((rem >= 2) & ~t1_valid & u, km2)
        u, km2 = alt_next(corr)
        scen["SD"] = ((rem >= 1) & u, km2)
        u, km2 = alt_next(corr)
        scen["DD"] = (u, km2)
        t3 = absorb(corr, i + 3)
        scen["ICI"] = ((rem >= 4) & probe(t3), t3)
        u, km2 = alt_last(t1)
        scen["ICS"] = ((rem >= 4) & ~t1_valid & u, km2)
        second = absorb(corr, i + 2)
        u, km2 = alt_next(second)
        scen["ICD"] = ((rem >= 4) & u, km2)
        sci = absorb(t1, i + 3)
        scen["SCI"] = (jnp.bool_(rem >= 4), sci)
        t2 = absorb(t1, i + 2)
        u, km2 = alt_last(t2)
        scen["SCS"] = ((rem >= 3) & t1_valid & ~probe(t2) & u, km2)
        u, km2 = alt_next(t1)
        scen["SCD"] = ((rem >= 2) & u, km2)
        scen["DCI"] = (jnp.bool_(rem >= 4), sci)
        t0 = absorb(corr, i + 0)
        u, km2 = alt_next(t0)
        scen["DCD"] = ((rem >= 2) & u, km2)

        NAMES = ("II", "IS", "SS", "SD", "DD", "ICI", "ICS", "ICD",
                 "SCI", "SCS", "SCD", "DCI", "DCD")
        APPLY_OFF = (3, 2, 2, 1, 0, 4, 3, 3, 4, 3, 2, 4, 1)
        CORRECT_OFF = (2, 2, 2, 1, 0, 3, 4, 2, 4, 3, 2, 1, 1)

        def last_n(km2, n):
            return [(km2 >> _u(2 * (n - 1 - t))) & _u(3) for t in range(n)]

        EMITS = {
            "II": lambda km2: last_n(corr, 1),
            "IS": lambda km2: last_n(corr, 1),
            "SS": lambda km2: last_n(km2, 2),
            "SD": lambda km2: last_n(km2, 2),
            "DD": lambda km2: last_n(km2, 2),
            "ICI": lambda km2: last_n(corr, 1),
            "ICS": lambda km2: last_n(km2, 2),
            "ICD": lambda km2: last_n(km2, 2),
            "SCI": lambda km2: last_n(km2, 3),
            "SCS": lambda km2: last_n(km2, 3),
            "SCD": lambda km2: last_n(km2, 3),
            "DCI": lambda km2: [],
            "DCD": lambda km2: last_n(km2, 3),
        }

        keeps, one_mores = [], []
        emit_word_l, emit_cnts, new_kmers, offs_c = [], [], [], []
        for s, name in enumerate(NAMES):
            a_ok, km2 = scen[name]
            off_a = APPLY_OFF[s]
            off_c = CORRECT_OFF[s]
            km = km2
            score_ok = a_ok & probe(km2) & (off_a + c <= rem)
            for t in range(c):
                km = absorb(km, i + off_a + t)
                score_ok = score_ok & probe(km)
            keeps.append(score_ok)

            bases = EMITS[name](km2)
            ew = jnp.zeros((), dtype=U32)
            for t, b in enumerate(bases):
                ew = ew | (b.astype(U32) << _u(2 * t))
            emit_word_l.append(ew)
            emit_cnts.append(len(bases))
            offs_c.append(off_c)

            nk = kmer >> _u(2)
            for b in bases:
                nk = add_nuc32(nk, b.astype(jnp.uint8), k)
            new_kmers.append(nk)

            om = corr >> _u(2)
            for b in bases:
                om = add_nuc32(om, b.astype(jnp.uint8), k)
            for t in range(c + 1):
                om = absorb(om, i + off_c + t)
            one_mores.append((rem > c + off_c + 1) & probe(om))

        keep = jnp.stack(keeps)
        one_more = jnp.stack(one_mores)
        nk1 = jnp.sum(keep.astype(I32), dtype=I32)
        keep2 = keep & one_more
        nk2 = jnp.sum(keep2.astype(I32), dtype=I32)
        sel = jnp.where(nk1 == 1, keep, keep2)
        ok = (nalts == 1) & ((nk1 == 1) | ((nk1 > 1) & (nk2 == 1)))

        selI = sel.astype(I32)
        selU = sel.astype(U32)
        consumed = jnp.sum(jnp.array(offs_c, dtype=I32) * selI, dtype=I32)
        cnt = jnp.sum(jnp.array(emit_cnts, dtype=I32) * selI, dtype=I32)
        emit0 = jnp.sum(jnp.stack(emit_word_l) * selU, dtype=U32)
        new_kmer = jnp.sum(jnp.stack(new_kmers) * sel.astype(kmer.dtype),
                           dtype=kmer.dtype)

        emit = jnp.zeros(1, dtype=U32).at[0].set(emit0)
        return AttemptOut3(ok, new_kmer, consumed, emit, cnt,
                           jnp.bool_(False))

    return attempt


def make_greedy_attempt32(probe, codes, k: int, ms: int, nb: int):
    """Greedy strategy (greedy.rs:129-173): engine.make_greedy_attempt in
    uint32, code-domain alignment (the driver routes non-pure-ACGT reads
    to the host oracle, where rust-bio's byte domain matters)."""
    if ms + 1 > BPW:
        raise ValueError("greedy max_search too large for one emit word")

    Lr = (k - 1) + (ms - 1)
    Lc = (k - 1) + (ms + 1)
    W = Lr + 1
    ND = Lr + Lc + 1
    T = Lr + Lc
    GO = -1
    GE = -1
    OE = GO + GE

    def attempt(i, kmer, length):
        rem = length - i
        nalts, corr = _alt_info32(probe, kmer)

        pre = kmer >> _u(2)
        before = [((pre >> _u(2 * (k - 2 - t))) & _u(3)).astype(jnp.uint8)
                  for t in range(k - 1)]

        wks = [corr]
        path = [(corr & _u(3)).astype(jnp.uint8)]
        fail_step = jnp.int32(ms)
        for s in range(ms):
            cands = jnp.stack([add_nuc32(wks[s], jnp.uint8(a), k)
                               for a in range(4)])
            okv = probe(cands)
            ns = jnp.sum(okv.astype(I32), dtype=I32)
            sa = jnp.sum(jnp.arange(4, dtype=U32) * okv.astype(U32), dtype=U32)
            nxt = add_nuc32(wks[s], sa.astype(jnp.uint8), k)
            branch_fail = ns != 1
            wk_next = jnp.where(branch_fail, wks[s], nxt)
            revisit = jnp.zeros((), dtype=bool)
            for p in wks:
                revisit = revisit | (wk_next == p)
            fail_here = branch_fail | revisit
            fail_step = jnp.where((fail_step == ms) & fail_here,
                                  jnp.int32(s), fail_step)
            wks.append(wk_next)
            path.append(sa.astype(jnp.uint8))

        r_full = jnp.stack(before + [
            _code_at(codes, i + t) for t in range(ms - 1)])
        c_full = jnp.stack(before + path)

        rows = jnp.arange(W, dtype=I32)

        def shift1(v, fill):
            return jnp.concatenate([jnp.full((1,), fill, v.dtype), v[:-1]])

        def diag_step(d, carry):
            # d is a Python int (unrolled): the traceback rows collect in
            # lists instead of .at[d].set on (ND, W) carry buffers — those
            # dynamic updates forced a padded-layout buffer copy per
            # fori_loop iteration and dominated the attempt cost
            # (isolated: 31 ms with fori+updates, ~0.5 ms without).
            Sp, Ip, Dp, sbp, Sp2, tb_s, tb_i, tb_d = carry
            j = d - rows
            inb = (j >= 0) & (j <= Lc)

            i_ext = shift1(Ip, NEG_INF) + GE
            i_opn = shift1(Sp, NEG_INF) + OE
            I_d = jnp.maximum(i_ext, i_opn)
            ib_d = jnp.where(i_ext > i_opn, jnp.int8(OP_INS),
                             shift1(sbp, jnp.int8(TB_START)))

            d_ext = Dp + GE
            d_opn = Sp + OE
            D_d = jnp.maximum(d_ext, d_opn)
            db_d = jnp.where(d_ext > d_opn, jnp.int8(OP_DEL), sbp)

            xr = r_full[jnp.clip(rows - 1, 0, Lr - 1)]
            yc = c_full[jnp.clip(j - 1, 0, Lc - 1)]
            msc = jnp.where(xr == yc, 1, -1)
            mbit = jnp.where(xr == yc, jnp.int8(OP_MATCH),
                             jnp.int8(OP_SUBST))
            m_val = shift1(Sp2, NEG_INF) + msc

            S_d = m_val
            sb_d = mbit
            S_d, sb_d = (jnp.maximum(S_d, I_d),
                         jnp.where(I_d > S_d, jnp.int8(OP_INS), sb_d))
            S_d2, sb_d2 = (jnp.maximum(S_d, D_d),
                           jnp.where(D_d > S_d, jnp.int8(OP_DEL), sb_d))
            S_d, sb_d = S_d2, sb_d2

            is_r0 = rows == 0
            is_j0 = j == 0
            border_rj = GO + GE * jnp.maximum(d, 1)
            S_d = jnp.where(is_r0 | is_j0, border_rj, S_d)
            I_d = jnp.where(is_r0, NEG_INF,
                            jnp.where(is_j0, border_rj, I_d))
            D_d = jnp.where(is_j0, NEG_INF,
                            jnp.where(is_r0, border_rj, D_d))
            sb_d = jnp.where(is_r0, jnp.int8(OP_DEL),
                             jnp.where(is_j0, jnp.int8(OP_INS), sb_d))
            ib_d = jnp.where(is_j0,
                             jnp.where(rows > 1, jnp.int8(OP_INS),
                                       jnp.int8(TB_START)), ib_d)
            db_d = jnp.where(is_r0,
                             jnp.where(j > 1, jnp.int8(OP_DEL),
                                       jnp.int8(TB_START)), db_d)
            S_d = jnp.where((d == 0) & is_r0, 0, S_d)
            sb_d = jnp.where((d == 0) & is_r0, jnp.int8(TB_START), sb_d)

            S_d = jnp.where(inb, S_d, NEG_INF)
            I_d = jnp.where(inb, I_d, NEG_INF)
            D_d = jnp.where(inb, D_d, NEG_INF)

            tb_s.append(sb_d)
            tb_i.append(ib_d)
            tb_d.append(db_d)
            return (S_d, I_d, D_d, sb_d, Sp, tb_s, tb_i, tb_d)

        neg = jnp.full(W, NEG_INF, dtype=I32)
        carry = (neg, neg, neg, jnp.zeros(W, jnp.int8), neg, [], [], [])
        for d in range(ND):
            carry = diag_step(d, carry)
        tb_s = jnp.stack(carry[5])
        tb_i = jnp.stack(carry[6])
        tb_d = jnp.stack(carry[7])

        its = jnp.arange(ms, dtype=I32)
        mr = (k - 1) + its
        mc = (k - 1) + its + 2

        # flattened 1-D traceback tables (vmapped 2-D gathers lower badly)
        tb_s_f = tb_s.reshape(ND * W)
        tb_i_f = tb_i.reshape(ND * W)
        tb_d_f = tb_d.reshape(ND * W)

        def tb_at(matf, r, j):
            d = jnp.clip(r + j, 0, ND - 1)
            return matf[d * W + jnp.clip(r, 0, Lr)]

        # NOTE: unrolling this loop (T=38 straight-line steps) sent the
        # XLA compile into the tens of minutes; keep the fori_loop.
        ops_rev0 = jnp.full((ms, T), jnp.int8(TB_START))

        def tb_step(t, st):
            r, j, layer, nops, ops_rev = st
            active = layer != TB_START
            is_ins = layer == OP_INS
            is_del = layer == OP_DEL
            ops_rev = ops_rev.at[:, t].set(
                jnp.where(active, layer, jnp.int8(TB_START)))
            nxt = jnp.where(
                is_ins, tb_at(tb_i_f, r, j),
                jnp.where(is_del, tb_at(tb_d_f, r, j),
                          tb_at(tb_s_f, r - 1, j - 1)))
            r2 = jnp.where(active, jnp.where(is_del, r, r - 1), r)
            j2 = jnp.where(active, jnp.where(is_ins, j, j - 1), j)
            layer2 = jnp.where(active, nxt, layer)
            nops2 = nops + active.astype(I32)
            return (r2, j2, layer2, nops2, ops_rev)

        layer0 = tb_at(tb_s_f, mr, mc)
        st = (mr, mc, layer0, jnp.zeros(ms, I32), ops_rev0)
        _r, _j, _l, nops, ops_rev = jax.lax.fori_loop(0, T, tb_step, st)

        w = jnp.arange(T, dtype=I32)[None, :]
        fwd_idx = jnp.clip(nops[:, None] - 1 - w, 0, T - 1)
        opsF = jnp.take_along_axis(ops_rev, fwd_idx, axis=1)
        in_ops = w < nops[:, None]
        is_m = (opsF == OP_MATCH) & in_ops
        contrib = jnp.where(opsF == OP_INS, 1,
                            jnp.where(opsF == OP_DEL, -1, 0)) * in_ops
        bl = k - 1
        nxt_m = jnp.concatenate([is_m[:, 1:], jnp.zeros((ms, 1), bool)], 1)
        pair = is_m & nxt_m & (w >= bl) & (w + 1 <= nops[:, None] - 1)
        first_w = jnp.min(jnp.where(pair, w, T + 1), axis=1)
        exists = jnp.any(pair, axis=1)
        offset = jnp.sum(contrib * ((w >= bl) & (w < first_w[:, None])), 1,
                         dtype=I32)
        rev_ind = (ops_rev == OP_INS) | (ops_rev == OP_DEL)
        rev_in = jnp.arange(T)[None, :] < nops[:, None]
        pref_ind = jnp.cumprod(
            rev_ind | ~rev_in, axis=1).astype(bool) & rev_in
        rev_contrib = jnp.where(ops_rev == OP_INS, 1,
                                jnp.where(ops_rev == OP_DEL, -1, 0))
        offset_corr = jnp.sum(rev_contrib * pref_ind, axis=1, dtype=I32)
        off_align = offset - offset_corr

        checks = []
        for it in range(ms):
            km = wks[it + 1]
            okc = (rem - it) >= nb
            for t in range(nb):
                km = add_nuc32(km, _code_at(codes, i + it + t), k)
                okc = okc & probe(km)
            checks.append(okc)
        check = jnp.stack(checks)

        ev_fail = (fail_step == its) | (rem < its)
        acc = exists & check & ~ev_fail
        event = ev_fail | acc
        first_ev = jnp.min(jnp.where(event, its, ms + 1))
        sel = (its == first_ev) & acc
        ok = (nalts == 1) & jnp.any(sel)

        it_sel = jnp.sum(its * sel.astype(I32), dtype=I32)
        cnt = it_sel + 2
        offs = jnp.sum(off_align * sel.astype(I32), dtype=I32)
        raw_consumed = cnt + offs
        consumed = jnp.maximum(raw_consumed, 0)
        cap = ok & (raw_consumed < 0)

        new_kmer = jnp.zeros((), kmer.dtype)
        for it in range(ms):
            new_kmer = jnp.where(sel[it], wks[it + 1], new_kmer)

        emit = jnp.zeros((), dtype=U32)
        for t in range(ms + 1):
            emit = emit | jnp.where(t < cnt,
                                    path[t].astype(U32) << _u(2 * t),
                                    _u(0))
        return AttemptOut3(ok, new_kmer, consumed,
                           jnp.zeros(1, U32).at[0].set(emit), cnt, cap)

    return attempt


def make_greedy_attempt32_arr(probe, codes, k: int, ms: int, nb: int):
    """Array-level, lane-LAST greedy attempt — bit-identical semantics to
    make_greedy_attempt32 (tests pin them against each other), but every
    2-D intermediate keeps the site-lane axis LAST so TPU tiles pad the
    small dimension (W=20 -> 24 sublanes) instead of the lane dimension
    (20 -> 128 lanes, 6.4x traffic).  The wavefront DP was the measured
    hot spot of the whole chain (PERF_NOTES r3)."""
    if ms + 1 > BPW:
        raise ValueError("greedy max_search too large for one emit word")

    Lr = (k - 1) + (ms - 1)
    Lc = (k - 1) + (ms + 1)
    W = Lr + 1
    ND = Lr + Lc + 1
    T = Lr + Lc
    GO = -1
    GE = -1
    OE = GO + GE

    def attempt(i, kmer, length, enabled=None):
        N = i.shape[0]
        rem = length - i
        nalts, corr = _alt_info32_arr(probe, kmer)

        pre = kmer >> _u(2)
        before = [((pre >> _u(2 * (k - 2 - t))) & _u(3)).astype(jnp.uint8)
                  for t in range(k - 1)]

        wks = [corr]
        path = [(corr & _u(3)).astype(jnp.uint8)]
        fail_step = jnp.full(N, ms, I32)
        for s in range(ms):
            cands = jnp.stack([add_nuc32(wks[s], jnp.uint8(a), k)
                               for a in range(4)])         # (4, N)
            okv = probe(cands)
            ns = jnp.sum(okv.astype(I32), axis=0, dtype=I32)
            sa = jnp.sum(jnp.arange(4, dtype=U32)[:, None] * okv.astype(U32),
                         axis=0, dtype=U32)
            nxt = add_nuc32(wks[s], sa.astype(jnp.uint8), k)
            branch_fail = ns != 1
            wk_next = jnp.where(branch_fail, wks[s], nxt)
            revisit = jnp.zeros(N, dtype=bool)
            for p in wks:
                revisit = revisit | (wk_next == p)
            fail_here = branch_fail | revisit
            fail_step = jnp.where((fail_step == ms) & fail_here,
                                  jnp.int32(s), fail_step)
            wks.append(wk_next)
            path.append(sa.astype(jnp.uint8))

        r_full = jnp.stack(before + [
            _code_at(codes, i + t) for t in range(ms - 1)])   # (Lr, N)
        c_full = jnp.stack(before + path)                     # (Lc, N)

        rows = np.arange(W)                                   # host ints

        def shift1(v, fill):
            return jnp.concatenate(
                [jnp.full((1, N), fill, v.dtype), v[:-1]], axis=0)

        # i16 scores: |score| <= T+2 and the -2^14 sentinel stay well in
        # range; halves the DP wavefront bytes (the body is bytes-bound)
        NEG16 = np.int16(-(1 << 14))
        neg = jnp.full((W, N), NEG16, dtype=jnp.int16)
        Sp, Ip, Dp, Sp2 = neg, neg, neg, neg
        sbp = jnp.zeros((W, N), jnp.int8)
        tb_s_rows, tb_i_rows, tb_d_rows = [], [], []
        xr_all = r_full[np.clip(rows - 1, 0, Lr - 1)]         # (W, N) static
        for d in range(ND):
            j = d - rows                                      # host ints (W,)
            inb = ((j >= 0) & (j <= Lc))[:, None]

            i_ext = shift1(Ip, NEG16) + jnp.int16(GE)
            i_opn = shift1(Sp, NEG16) + jnp.int16(OE)
            I_d = jnp.maximum(i_ext, i_opn)
            ib_d = jnp.where(i_ext > i_opn, jnp.int8(OP_INS),
                             shift1(sbp, jnp.int8(TB_START)))

            d_ext = Dp + jnp.int16(GE)
            d_opn = Sp + jnp.int16(OE)
            D_d = jnp.maximum(d_ext, d_opn)
            db_d = jnp.where(d_ext > d_opn, jnp.int8(OP_DEL), sbp)

            yc = c_full[np.clip(j - 1, 0, Lc - 1)]            # (W, N) static
            msc = jnp.where(xr_all == yc, jnp.int16(1), jnp.int16(-1))
            mbit = jnp.where(xr_all == yc, jnp.int8(OP_MATCH),
                             jnp.int8(OP_SUBST))
            m_val = shift1(Sp2, NEG16) + msc

            S_d = m_val
            sb_d = mbit
            S_d, sb_d = (jnp.maximum(S_d, I_d),
                         jnp.where(I_d > S_d, jnp.int8(OP_INS), sb_d))
            S_d2, sb_d2 = (jnp.maximum(S_d, D_d),
                           jnp.where(D_d > S_d, jnp.int8(OP_DEL), sb_d))
            S_d, sb_d = S_d2, sb_d2

            is_r0 = (rows == 0)[:, None]
            is_j0 = (j == 0)[:, None]
            border_rj = np.int16(GO + GE * max(d, 1))
            S_d = jnp.where(is_r0 | is_j0, border_rj, S_d)
            I_d = jnp.where(is_r0, NEG16,
                            jnp.where(is_j0, border_rj, I_d))
            D_d = jnp.where(is_j0, NEG16,
                            jnp.where(is_r0, border_rj, D_d))
            sb_d = jnp.where(is_r0, jnp.int8(OP_DEL),
                             jnp.where(is_j0, jnp.int8(OP_INS), sb_d))
            ib_d = jnp.where(is_j0,
                             jnp.where((rows > 1)[:, None], jnp.int8(OP_INS),
                                       jnp.int8(TB_START)), ib_d)
            db_d = jnp.where(is_r0,
                             jnp.where((j > 1)[:, None], jnp.int8(OP_DEL),
                                       jnp.int8(TB_START)), db_d)
            if d == 0:
                S_d = jnp.where(is_r0, np.int16(0), S_d)
                sb_d = jnp.where(is_r0, jnp.int8(TB_START), sb_d)

            S_d = jnp.where(inb, S_d, NEG16)
            I_d = jnp.where(inb, I_d, NEG16)
            D_d = jnp.where(inb, D_d, NEG16)

            tb_s_rows.append(sb_d)
            tb_i_rows.append(ib_d)
            tb_d_rows.append(db_d)
            Sp, Ip, Dp, sbp, Sp2 = S_d, I_d, D_d, sb_d, Sp

        # one packed table (3 bits/layer-entry per cell: S | I<<2... packed
        # as base-5 into i8) so the traceback loop pays ONE gather per
        # step instead of three — the 3x take_along_axis was ~half the
        # measured 25 ms attempt body (r4 on-chip bisect)
        tb_s_st = jnp.stack(tb_s_rows)
        tb_i_st = jnp.stack(tb_i_rows)
        tb_d_st = jnp.stack(tb_d_rows)
        tb_pack = (tb_s_st + jnp.int8(5) * tb_i_st
                   + jnp.int8(25) * tb_d_st).reshape(ND * W, N)

        its = jnp.arange(ms, dtype=I32)[:, None]              # (ms, 1)
        mr = (k - 1) + jnp.broadcast_to(its, (ms, N))
        mc = mr + 2

        def tb_at_packed(r, j, roff, joff):
            """Packed-table lookup at (r+roff, j+joff) — the S layer needs
            the (-1,-1) diagonal step, I/D the same cell."""
            rr = r + roff
            jj = j + joff
            d = jnp.clip(rr + jj, 0, ND - 1)
            return jnp.take_along_axis(
                tb_pack, d * W + jnp.clip(rr, 0, Lr), axis=0)

        ops_rev0 = jnp.full((T, ms, N), jnp.int8(TB_START))

        def tb_step(t, st):
            r, j, layer, nops, ops_rev = st
            active = layer != TB_START
            is_ins = layer == OP_INS
            is_del = layer == OP_DEL
            ops_rev = ops_rev.at[t].set(
                jnp.where(active, layer, jnp.int8(TB_START)))
            is_sub = ~is_ins & ~is_del
            pk = tb_at_packed(r - is_sub.astype(I32), j - is_sub.astype(I32),
                              0, 0).astype(I32)
            ent_s = pk % 5
            ent_i = (pk // 5) % 5
            ent_d = pk // 25
            nxt = jnp.where(is_ins, ent_i,
                            jnp.where(is_del, ent_d, ent_s)).astype(jnp.int8)
            r2 = jnp.where(active, jnp.where(is_del, r, r - 1), r)
            j2 = jnp.where(active, jnp.where(is_ins, j, j - 1), j)
            layer2 = jnp.where(active, nxt, layer)
            nops2 = nops + active.astype(I32)
            return (r2, j2, layer2, nops2, ops_rev)

        pk0 = tb_at_packed(mr, mc, 0, 0).astype(I32)
        layer0 = (pk0 % 5).astype(jnp.int8)
        st = (mr, mc, layer0, jnp.zeros((ms, N), I32), ops_rev0)
        _r, _j, _l, nops, ops_rev = jax.lax.fori_loop(0, T, tb_step, st)
        # ops_rev: (T, ms, N); axis 0 is the w/t axis of the per-lane code

        w = jnp.arange(T, dtype=I32)[:, None, None]           # (T, 1, 1)
        fwd_idx = jnp.clip(nops[None] - 1 - w, 0, T - 1)      # (T, ms, N)
        opsF = jnp.take_along_axis(ops_rev, fwd_idx, axis=0)
        in_ops = w < nops[None]
        is_m = (opsF == OP_MATCH) & in_ops
        contrib = jnp.where(opsF == OP_INS, 1,
                            jnp.where(opsF == OP_DEL, -1, 0)) * in_ops
        bl = k - 1
        nxt_m = jnp.concatenate(
            [is_m[1:], jnp.zeros((1, ms, N), bool)], axis=0)
        pair = is_m & nxt_m & (w >= bl) & (w + 1 <= nops[None] - 1)
        first_w = jnp.min(jnp.where(pair, w, T + 1), axis=0)  # (ms, N)
        exists = jnp.any(pair, axis=0)
        offset = jnp.sum(contrib * ((w >= bl) & (w < first_w[None])),
                         axis=0, dtype=I32)
        rev_ind = (ops_rev == OP_INS) | (ops_rev == OP_DEL)
        rev_in = jnp.arange(T, dtype=I32)[:, None, None] < nops[None]
        pref_ind = jnp.cumprod(
            rev_ind | ~rev_in, axis=0).astype(bool) & rev_in
        rev_contrib = jnp.where(ops_rev == OP_INS, 1,
                                jnp.where(ops_rev == OP_DEL, -1, 0))
        offset_corr = jnp.sum(rev_contrib * pref_ind, axis=0, dtype=I32)
        off_align = offset - offset_corr                      # (ms, N)

        checks = []
        for it in range(ms):
            km = wks[it + 1]
            okc = (rem - it) >= nb
            for t in range(nb):
                km = add_nuc32(km, _code_at(codes, i + it + t), k)
                okc = okc & probe(km)
            checks.append(okc)
        check = jnp.stack(checks)                             # (ms, N)

        its2 = jnp.arange(ms, dtype=I32)[:, None]
        ev_fail = (fail_step[None] == its2) | (rem[None] < its2)
        acc = exists & check & ~ev_fail
        event = ev_fail | acc
        first_ev = jnp.min(jnp.where(event, its2, ms + 1), axis=0)  # (N,)
        sel = (its2 == first_ev[None]) & acc                  # (ms, N)
        ok = (nalts == 1) & jnp.any(sel, axis=0)

        it_sel = jnp.sum(its2 * sel.astype(I32), axis=0, dtype=I32)
        cnt = it_sel + 2
        offs = jnp.sum(off_align * sel.astype(I32), axis=0, dtype=I32)
        raw_consumed = cnt + offs
        consumed = jnp.maximum(raw_consumed, 0)
        cap = ok & (raw_consumed < 0)

        new_kmer = jnp.zeros(N, kmer.dtype)
        for it in range(ms):
            new_kmer = jnp.where(sel[it], wks[it + 1], new_kmer)

        emit = jnp.zeros(N, dtype=U32)
        for t in range(ms + 1):
            emit = emit | jnp.where(t < cnt,
                                    path[t].astype(U32) << _u(2 * t),
                                    _u(0))
        return AttemptOut3(ok, new_kmer, consumed, emit[:, None], cnt, cap)

    return attempt


# ---------------------------------------------------------------------------
# Unique-successor de Bruijn walk, array-level and two-tier (u32 port of
# engine2._walk_phase/_tiered_walk; semantics graph.rs:44-85).
# ---------------------------------------------------------------------------


def _alt_info32_arr(probe, kmer):
    """Array form of the 'exactly one alternative' gate; kmer (N,)
    in the register dtype (u32 for k <= 15, u64 for k = 17)."""
    base = (kmer >> _u(2)) << _u(2)
    cands = base[None, :] ^ jnp.arange(4, dtype=U32)[:, None]
    ok = probe(cands)
    n = jnp.sum(ok.astype(I32), axis=0, dtype=I32)
    alt = jnp.sum(jnp.arange(4, dtype=U32)[:, None] * ok.astype(U32),
                  axis=0, dtype=U32)
    return n, base ^ alt


def _walk_active(wk, n, status, use_fc, max_steps, phase_cap: int):
    return (status == RUN) & (use_fc | ((n - 1) < max_steps)) & \
        (n <= phase_cap)


def _walk_phase32(probe, k: int, state, use_fc, max_steps, first_correct,
                  phase_cap: int, nh: int, wp: WalkProfile = DEFAULT_WP):
    """Advance the walk until every lane freezes (array-level while_loop).

    state = (wk, n, buf, status, hist); hist[:, j] = register after step j
    (slot 0 = start k-mer), so `revisit` is exact.  ``use_fc`` per-lane
    selects graph mode (accept on reaching ``first_correct``) vs fill
    mode (walk exactly ``max_steps``).  CAP outranks ACCEPT at the
    wp.walk_max step."""
    wcols = jnp.arange(wp.ew, dtype=I32)[None, :]
    hcols = jnp.arange(nh, dtype=I32)[None, :]

    def cond(st):
        wk, n, buf, status, hist = st
        return jnp.any(_walk_active(wk, n, status, use_fc, max_steps,
                                    phase_cap))

    def body(st):
        wk, n, buf, status, hist = st
        act = _walk_active(wk, n, status, use_fc, max_steps, phase_cap)
        cands = jnp.stack([add_nuc32(wk, jnp.uint8(a), k) for a in range(4)])
        okv = probe(cands)
        ns = jnp.sum(okv.astype(I32), axis=0, dtype=I32)
        sa = jnp.sum(jnp.arange(4, dtype=U32)[:, None] * okv.astype(U32),
                     axis=0, dtype=U32)
        wk2 = add_nuc32(wk, sa.astype(jnp.uint8), k)
        branch_fail = ns != 1
        revisit = jnp.any(hist == wk2[:, None], axis=1)
        accept = use_fc & (wk2 == first_correct)
        capped = n >= wp.walk_max

        wi = n // BPW
        sh = ((n % BPW) * 2).astype(U32)
        bupd = (wcols == wi[:, None]) & act[:, None]
        buf = jnp.where(bupd, buf | (sa[:, None] << sh[:, None]), buf)
        hupd = (hcols == jnp.minimum(n, nh - 1)[:, None]) & act[:, None]
        hist = jnp.where(hupd, wk2[:, None], hist)
        st2 = jnp.where(
            branch_fail | revisit, DECLINE,
            jnp.where(capped, CAP, jnp.where(accept, ACCEPT, RUN)))
        status = jnp.where(act, st2.astype(I32), status)
        wk = jnp.where(act, wk2, wk)
        n = jnp.where(act, n + 1, n)
        return (wk, n, buf, status, hist)

    return jax.lax.while_loop(cond, body, state)


def _brent_walk32(probe, k: int, wk, n, status, first_correct, use_fc,
                  max_steps, t3_cap: int, unroll: int = 8):
    """Tier-3 walk continuation with O(1) revisit state.

    Lanes arriving here ran WALK_MAX unique-successor steps without
    branching, revisiting, or (graph mode) reaching ``first_correct``.
    The explicit history tiers can't extend further, but exact DECLINEs
    don't need one: in a unique-successor walk a revisit implies a pure
    cycle, and Brent detection firing at step d means a TRUE revisit
    happened at some step <= d — so every DECLINE issued here is one the
    reference's first-revisit guard (graph.rs:71-75) also issues, and a
    cycle precludes ever reaching ``first_correct`` (its first arrival
    would precede any revisit).  Outcomes that would need an emit longer
    than the walk buffer stay CAP (host): graph-mode arrival at
    ``first_correct``, fill-mode completion of all ``max_steps``, or
    exceeding ``t3_cap``."""

    def cond(st):
        wk, n, status, saved, lam, power = st
        return jnp.any(status == RUN)

    def body(st):
        wk, n, status, saved, lam, power = st
        for _ in range(unroll):
            act = status == RUN
            cands = jnp.stack([add_nuc32(wk, jnp.uint8(a), k)
                               for a in range(4)])
            okv = probe(cands)
            ns = jnp.sum(okv.astype(I32), axis=0, dtype=I32)
            sa = jnp.sum(jnp.arange(4, dtype=U32)[:, None]
                         * okv.astype(U32), axis=0, dtype=U32)
            wk2 = add_nuc32(wk, sa.astype(jnp.uint8), k)
            branch = ns != 1
            accept = use_fc & (wk2 == first_correct)   # emit too long
            # phase semantics: a lane steps while (n-1) < max_steps, so
            # the step taken at n == max_steps is its last; branch/cycle
            # on that step still DECLINEs (checked first above)
            done_fill = ~use_fc & (n >= max_steps)      # ditto
            cycle = wk2 == saved
            over = n + 1 >= t3_cap
            st2 = jnp.where(
                branch | cycle, DECLINE,
                jnp.where(accept | done_fill | over, CAP, RUN))
            status = jnp.where(act, st2.astype(I32), status)
            wk = jnp.where(act, wk2, wk)
            n = jnp.where(act, n + 1, n)
            # Brent: lengthen the probe window in powers of two
            lam = jnp.where(act, lam + 1, lam)
            renew = act & (lam >= power)
            saved = jnp.where(renew, wk, saved)
            power = jnp.where(renew, power * 2, power)
            lam = jnp.where(renew, 0, lam)
        return (wk, n, status, saved, lam, power)

    one = jnp.ones_like(n)
    st = (wk, n, status, wk, jnp.zeros_like(n), one)
    wk, n, status, _s, _l, _p = jax.lax.while_loop(cond, body, st)
    return wk, n, status


#: tier-3 lane capacity (full block width: at CHUNK=2^19 a rev-direction
#: queue trip can carry ~1000 long-walk lanes, far past tier 2's NW2)
#: and step bound (walks longer than T3_CAP cap to the host; measured on
#: the corpus, nearly all tier-3 walks decline well before this).
NW3 = BLK
T3_CAP = 1 << 14


def _tiered_walk32(probe, k: int, corr, alt_code, first_correct, use_fc,
                   max_steps, enabled, wp: WalkProfile = DEFAULT_WP):
    """Full walk over N lanes: tier 1 (all lanes, <= T1_STEPS, full RING
    history), tier 2 (<= NW2 surviving lanes, <= wp.walk_max, full
    wp.nh2 history), then tier 3 (graph-mode lanes that out-ran
    wp.walk_max; Brent cycle detection, exact DECLINEs, CAP only for
    genuinely device-hostile outcomes).  Returns (ok, cap, buf, n, wk)."""
    N = corr.shape[0]
    buf0 = jnp.zeros((N, wp.ew), U32).at[:, 0].set(alt_code.astype(U32))
    hist0 = jnp.full((N, RING), _sent(k)).at[:, 0].set(corr)
    status0 = jnp.where(enabled, RUN, DECLINE).astype(I32)
    st = (corr, jnp.ones(N, I32), buf0, status0, hist0)
    wk, n, buf, status, hist = _walk_phase32(
        probe, k, st, use_fc, max_steps, first_correct, T1_STEPS, RING,
        wp)

    # tier 2 in ROUNDS of NW2 lanes: a reverse-direction queue trip can
    # carry ~1000 long-walk lanes (every site of a fully-invalid read),
    # and a single NW2-wide pass used to overflow them to CAP — silently
    # renouncing accepts tier 2 could have emitted.  The rounds loop
    # drains every pending lane with bounded (NW2, NH2) history memory.
    lanes = jnp.arange(N, dtype=I32)

    def rounds_cond(st):
        return jnp.any(st[4])

    def rounds_body(st):
        wk, n, buf, status, pend = st
        (c_wk, c_n, c_buf, c_hist, c_fc, c_ufc, c_ms, c_src), c_ok, _o, _ = \
            _compact(pend, (wk, n, buf, hist, first_correct, use_fc,
                            max_steps, lanes), wp.nw2, with_src=True)
        hist2 = jnp.full((wp.nw2, wp.nh2), _sent(k)).at[:, :RING].set(
            c_hist)
        st2 = (c_wk, c_n, c_buf,
               jnp.where(c_ok, RUN, DECLINE).astype(I32), hist2)
        wk2, n2a, buf2, status2, _h = _walk_phase32(
            probe, k, st2, c_ufc, c_ms, c_fc, wp.walk_max, wp.nh2, wp)
        idx = jnp.where(c_ok, c_src, N)  # OOB rows dropped by scatter
        wk = wk.at[idx].set(wk2, mode="drop")
        n = n.at[idx].set(n2a, mode="drop")
        buf = buf.at[idx].set(buf2, mode="drop")
        status = status.at[idx].set(status2, mode="drop")
        pend = pend & (jnp.cumsum(pend.astype(I32), dtype=I32) > wp.nw2)
        return (wk, n, buf, status, pend)

    pend = _walk_active(wk, n, status, use_fc, max_steps, wp.walk_max)
    wk, n, buf, status, _p = jax.lax.while_loop(
        rounds_cond, rounds_body, (wk, n, buf, status, pend))

    # tier 3: lanes that out-ran WALK_MAX (real-corpus walks routinely
    # exceed it in long invalid regions and then DECLINE; this resolves
    # them on device instead of capping 70% of reads to the host, BENCH
    # r4 diagnosis).  Graph mode chases first_correct; fill mode runs to
    # its gap length — completions that would out-emit the buffer CAP.
    # The rounds loop above drains every pending lane through tier 2, so
    # the only CAP source reaching here is the WALK_MAX cap; tier-3
    # lanes therefore always enter at exactly wk-step WALK_MAX.  Brent
    # DECLINEs are exact from any starting point, and accepts (whose
    # emitted bases tier 2 no longer holds) conservatively CAP to the
    # host via the t_wk == t_fc guard below.
    pend3 = status == CAP
    (t_wk, t_n, t_fc, t_ufc, t_ms, t_src), t_ok, _over3, _ = _compact(
        pend3, (wk, n, first_correct, use_fc, max_steps,
                jnp.arange(N, dtype=I32)), NW3, with_src=True)
    # a graph lane that capped exactly ON first_correct is a true ACCEPT
    # the device renounced (CAP-outranks-ACCEPT rule) — keep it CAP:
    # walking past it would turn an accept into a bogus decline
    st3 = jnp.where(t_ok, jnp.where(t_ufc & (t_wk == t_fc), CAP, RUN),
                    DECLINE).astype(I32)
    wk3, n3, status3 = _brent_walk32(probe, k, t_wk, t_n, st3, t_fc,
                                     t_ufc, t_ms, T3_CAP)
    idx3 = jnp.where(t_ok, t_src, N)  # overflow lanes keep their CAP
    status = status.at[idx3].set(status3, mode="drop")
    wk = wk.at[idx3].set(wk3, mode="drop")
    n = n.at[idx3].set(n3, mode="drop")

    ok = jnp.where(use_fc, status == ACCEPT, status == RUN)
    return ok, status == CAP, buf, n, wk


def make_graph_attempt32_arr(probe, codes, k: int, err_fn,
                             wp: WalkProfile = DEFAULT_WP):
    """Graph strategy (graph.rs:44-85) over arrays of sites."""

    def attempt(i, kmer, length, enabled):
        err_len, fc = err_fn(i, kmer, length)
        nalts, corr = _alt_info32_arr(probe, kmer)
        alt_code = corr & _u(3)
        ok_w, cap, buf, n, wk = _tiered_walk32(
            probe, k, corr, alt_code, fc,
            jnp.ones(i.shape, bool), jnp.full(i.shape, wp.walk_max, I32),
            enabled & (nalts == 1), wp)
        ok = (nalts == 1) & ok_w
        return AttemptOut3(ok, wk, err_len + 1, buf, n,
                           enabled & (nalts == 1) & cap)

    return attempt


def make_gap_attempt32_arr(probe, codes, k: int, c: int, err_fn,
                           wp: WalkProfile = DEFAULT_WP):
    """GapSize dispatch (gap_size.rs:97-108) over arrays of sites."""
    one = make_one_attempt32(probe, codes, k, c)
    one_v = jax.vmap(one)

    def attempt(i, kmer, length, enabled):
        err_len, fc = err_fn(i, kmer, length)
        nalts, corr = _alt_info32_arr(probe, kmer)
        alt_code = corr & _u(3)

        is_graph = err_len < k
        gap = jnp.maximum(err_len - k, 0)
        is_one = err_len == k
        is_fill = err_len > k
        # one walk serves both graph mode and fill mode (per-lane select)
        ok_w, cap_w, buf, n, wk = _tiered_walk32(
            probe, k, corr, alt_code, fc, is_graph, gap,
            enabled & (is_graph | is_fill) & (nalts == 1), wp)
        o = one_v(i, kmer, length)

        ok = jnp.where(is_one, o.ok, (nalts == 1) & ok_w)
        cap_hit = enabled & ~is_one & (nalts == 1) & cap_w
        new_kmer = jnp.where(is_one, o.new_kmer, wk)
        consumed = jnp.where(is_graph, err_len + 1,
                             jnp.where(is_one, o.consumed, n))
        cnt = jnp.where(is_one, o.cnt, n)
        emitz = jnp.zeros_like(buf).at[:, 0].set(o.emit[:, 0])
        emit = jnp.where(is_one[:, None], emitz, buf)
        return AttemptOut3(ok, new_kmer, consumed, emit, cnt, cap_hit)

    return attempt


def make_ladder_attempt32(probe, codes, k: int, c: int, ms: int, nb: int,
                          err_fn, wp: WalkProfile = DEFAULT_WP):
    """The full per-site strategy ladder, fused into one attempt.

    EXPERIMENTAL — NOT the reference semantics.  The reference applies
    each strategy as a sequential full-read pass:
    `methods.iter().for_each(|x| correct = x.correct(&correct))`
    (/root/reference/src/lib.rs:106-108).  This ladder instead resolves
    each site with the first strategy that succeeds there, in chain
    order.  The two plans agree only when no repair's confirmation /
    lookahead window reaches the next error site (roughly: error
    spacing >= k and confirm/max_search windows < k); on repeat-rich
    real reads they diverge (measured: 50/80 corpus reads at k=11).
    Kept as an opt-in (`fused=True`) optimization and differential
    target; the cascade is the default and the bit-exactness contract.
    It pays the dense precompute + chain walk + splice once per
    direction instead of five times.

    All five attempts are evaluated vectorized on every lane and the
    winner is selected by priority.  Cap semantics: if a strategy hits an
    engineered bound (cap) at a site BEFORE any earlier strategy
    succeeded, the true ladder outcome is unknowable on device -> the
    site caps (host oracle fallback).  A cap in a strategy that the
    ladder would never have consulted (an earlier one succeeded) is
    masked out."""
    one_v = jax.vmap(make_one_attempt32(probe, codes, k, c))
    two_v = jax.vmap(make_two_attempt32(probe, codes, k, c))
    graph_a = make_graph_attempt32_arr(probe, codes, k, err_fn, wp)
    greedy_a = make_greedy_attempt32_arr(probe, codes, k, ms, nb)
    gap_a = make_gap_attempt32_arr(probe, codes, k, c, err_fn, wp)
    EWL = emit_words("ladder", wp.ew)

    def pad_emit(emit):
        n, ew = emit.shape
        if ew == EWL:
            return emit
        return jnp.concatenate(
            [emit, jnp.zeros((n, EWL - ew), U32)], axis=1)

    def attempt(i, kmer, length, enabled):
        outs = (one_v(i, kmer, length),
                two_v(i, kmer, length),
                graph_a(i, kmer, length, enabled),
                greedy_a(i, kmer, length),
                gap_a(i, kmer, length, enabled))
        N = i.shape[0]
        taken = jnp.zeros(N, bool)
        ok = jnp.zeros(N, bool)
        cap = jnp.zeros(N, bool)
        new_kmer = jnp.zeros(N, kmer.dtype)
        consumed = jnp.zeros(N, I32)
        cnt = jnp.zeros(N, I32)
        emit = jnp.zeros((N, EWL), U32)
        for o in outs:
            ev = (o.ok | o.cap) & ~taken
            pick_cap = ev & o.cap          # unknown outcome -> cap wins
            pick_ok = ev & o.ok & ~o.cap
            ok = ok | pick_ok
            cap = cap | pick_cap
            new_kmer = jnp.where(pick_ok, o.new_kmer, new_kmer)
            consumed = jnp.where(pick_ok, o.consumed.astype(I32), consumed)
            cnt = jnp.where(pick_ok, o.cnt.astype(I32), cnt)
            emit = jnp.where(pick_ok[:, None], pad_emit(o.emit), emit)
            taken = taken | ev
        return AttemptOut3(ok, new_kmer, consumed, emit, cnt, cap)

    return attempt


# ---------------------------------------------------------------------------
# The pass builder.
# ---------------------------------------------------------------------------


def make_pass3_fn(k: int, strategy: str, c: int, ms: int, nb: int,
                  CHUNK: int, R: int, _debug: bool = False,
                  _cut: str | None = None, walk_max: int = WALK_MAX,
                  blk: int | None = None, batch: bool = False,
                  carry: bool = False, emit_dirty: bool = False):
    """One jitted (table, codes (CHUNK,) u8, rstart (R,) i32,
    rlen (R,) i32) -> (out codes (CHUNK,) u8, out_lens (R,) i32,
    cap (R,) bool, aux (8,) i32).

    Reads live in contiguous slots [rstart[r], rstart[r]+slotcap) of one
    flat 2-bit-code position buffer; unused slots have rstart = CHUNK,
    rlen = 0.  Slot capacities are implied: slotcap[r] = rstart[r+1] -
    rstart[r] (last: CHUNK - rstart).  aux = (sites, cap-overflow,
    cap-attempt, cap-rounds, visited sites, applied records, capped
    reads, raw site count).

    r5 data-movement redesign: a pass owes exactly TWO CHUNK-sized HBM
    gathers (the bitfield probe and the splice gather) — every other
    per-position table (read id, read start/len, segment id/start,
    splice source) is a scatter+scan fill, measured ~13x cheaper than
    the CHUNK-from-small-table gathers they replace (8.3 ms -> 0.6 ms
    at 2^20, scripts/op_patterns.py).  Output codes beyond out_len are
    stale garbage by design: every consumer (the next pass's masks, the
    reverse program, the host decode) slices by length first.

    Cross-pass incremental validity (VERDICT r4 item 1): the codes
    array is really codesV u8 — bit 0-1 the base, bit 2 the raw
    bitfield-probe result of the k-mer ending at that position.  The
    splice gather moves the V bit POSITIONALLY with the code (a window
    fully inside one segment maps exactly onto its source window), and
    an ``emit_dirty=True`` pass emits a dirty-position list covering
    every window that spans a segment boundary or emitted content
    ([pos_v, pos_v+k-1) and [pos_e, pos_e+crc+k-1) per record).  A
    ``carry=True`` pass then skips the dense probe: it re-probes ONLY
    the listed positions (spurious entries are harmless — they scatter
    the true probe value; a list overflow is signalled by dcnt = -1 and
    falls back to the dense probe in-graph).  The carried bit is valid
    wherever the masks allow its use (pin >= k-1 implies the source
    window carried a real probe result, by induction from the
    dense-probing chain head).

    MEASURED AND OFF BY DEFAULT: the list machinery costs ~ND x
    ~10 ns/lane every producing pass (lane-scale op wall, PERF_NOTES),
    which rivals the ~9 ms dense probe it saves — e2e the carry chain
    measured ~-12% (67.9 vs 77.4 reads/s at k=13).  The capability is
    kept (correctness-tested) for stacks where gathers dominate.
    Signature with carry: (table, codesV, rstart, rlen, dlist, dcnt);
    a pass RETURNS (codesV, out_lens, cap, aux, dlist, dcnt) — dlist
    is a (1,) dummy with dcnt = -1 unless emit_dirty."""
    _check_k(k)
    assert CHUNK % 4 == 0 and R >= 1
    # geometry fills pack (rid, value) into one monotone i32 key
    assert R * 2 * CHUNK < (1 << 31), "rid|len key must fit i32"
    wp = walk_profile(walk_max)
    EW = emit_words(strategy, wp.ew)
    NS = max(BLK, CHUNK // 32)       # site-id capacity
    NQA = NS                         # dirty re-attempt queue capacity
    NR = NS                          # compacted (visited) record capacity
    # queue-block width.  Measured on the corpus (r4, old pass
    # structure): the block body's cost scales with LANES (padded-buffer
    # bytes), not just op count — 8192 lanes cut trips but ran the whole
    # chain 2.5x SLOWER.  2048 is the measured sweet spot; the param
    # exists for re-measurement against new pass structures.
    blk = min(blk or BLK, NS)
    # queue-generation guard: full blocks plus slack for small tail
    # generations (nested repair chains); leftovers cap -> oracle.
    MAXB = (NS + NQA) // blk + 64
    LV = NS.bit_length()             # pointer-doubling levels

    # dirty-list capacity (carry path).  Lane-scale ops cost ~10 ns/lane
    # each (PERF_NOTES), so the list machinery itself costs ~ND-
    # proportional time EVERY pass: at CHUNK//4 it measured ~-12% e2e
    # (more than the probe it saves).  CHUNK//16 fits the later passes'
    # real dirty counts; the repair-heavy first handoff overflows to the
    # in-graph dense fallback, which is exactly the pre-carry cost.
    ND = CHUNK // 16

    def passfn(table, codesV, rstart, rlen, dlist=None, dcnt=None):
        probe = dc.make_solid_probe_any(table, k)

        # ---------------- 1. dense precompute --------------------------
        codes = codesV & U8(3)
        if k <= 15:
            kmers = dc.rolling_kmers32(codes, k)         # (CHUNK,) u32
        else:
            kmers = dc.rolling_kmers(codes, k)           # (CHUNK,) u64
        pos = jnp.arange(CHUNK, dtype=I32)

        # Read geometry via delta-scatter + cumsum fills.  cummax is
        # pathological on this XLA/TPU stack (14.9 ms vs 0.26 ms for
        # cumsum at 2^20, scripts/op_patterns.py), so every stepwise-
        # constant fill scatters the per-boundary DELTA and integrates:
        # slot values are known per slot, so consecutive differences are
        # exact, and .add-scatters telescope under position collisions.
        # key packs (rid, len) in one fill: key = rid*2C + rlen.
        LSH = 2 * CHUNK
        slotkey = jnp.arange(R, dtype=I32) * LSH + rlen
        kd = slotkey - jnp.concatenate([jnp.zeros(1, I32), slotkey[:-1]])
        key = jnp.cumsum(
            jnp.zeros(CHUNK, I32).at[rstart].add(kd, mode="drop"),
            dtype=I32)
        rid = key // LSH                                 # read id per pos
        len_of = key % LSH
        sd = rstart - jnp.concatenate([jnp.zeros(1, I32), rstart[:-1]])
        start_of = jnp.cumsum(
            jnp.zeros(CHUNK, I32).at[rstart].add(sd, mode="drop"),
            dtype=I32)
        pin = pos - start_of
        endf_of = start_of + len_of                      # flat read end

        if carry:
            # incremental validity: the splice of the previous pass
            # carried the raw probe bit in codesV bit 2; re-probe only
            # the listed dirty windows (dcnt < 0 = list overflowed ->
            # dense re-probe)
            Vc = ((codesV >> U8(2)) & U8(1)) == U8(1)

            def _sparse(_):
                fix = probe(kmers[jnp.clip(dlist, 0, CHUNK - 1)])
                return Vc.at[dlist].set(fix, mode="drop")

            def _dense(_):
                return probe(kmers)

            Vraw = jax.lax.cond(dcnt < 0, _dense, _sparse, None)
        else:
            Vraw = probe(kmers)
        V = Vraw & (pin >= k - 1) & (pin < len_of)
        Vprev = jnp.pad(V[:-1], (1, 0))
        T = Vprev & ~V & (pin >= k) & (pin < len_of)

        cumT = jnp.cumsum(T.astype(I32), dtype=I32)
        n_sites = cumT[-1]
        n_eff = jnp.minimum(n_sites, NS)
        nv = _rcummin(jnp.where(V, pos, BIG))            # next valid >= p
        nt = _rcummin(jnp.where(T, pos, BIG))            # next transition

        rend = rstart + rlen
        # reads whose sites were dropped by the NS cap
        cumT_s = jnp.where(rstart > 0,
                           cumT[jnp.clip(rstart - 1, 0, CHUNK - 1)], 0)
        cumT_e = cumT[jnp.clip(rend - 1, 0, CHUNK - 1)]
        cap_read = (rlen > 0) & (cumT_e > jnp.maximum(cumT_s, NS))

        if _cut == "dense":
            # stage-bisect: consume every dense product so XLA keeps it
            aux0 = jnp.stack([n_eff, nv[0], nt[0], cumT[-1],
                              jnp.sum(V.astype(I32), dtype=I32),
                              jnp.sum(cap_read.astype(I32), dtype=I32),
                              jnp.int32(0), jnp.minimum(n_sites, BIG)])
            return codes, rlen, cap_read, aux0

        # ---------------- attempt machinery ----------------------------
        def err_fn(i, kmer, length):
            """Exact error_len (mod.rs:130-152) for any register in O(k):
            absorb at most k explicit steps (after k absorbs the register
            provably equals the rolling table k-mer), then jump to the
            next valid position via the nv table.

            Batched-window form (r5): the per-step code reads are ONE
            (N, k) gather and the per-step probes ONE batched probe —
            prospective registers assume continuous absorption, which
            matches the scalar walk up to each lane's stop step, and
            values past the stop are masked out."""
            rem = length - i
            win = codes[jnp.clip(
                i[:, None] + jnp.arange(1, k + 1, dtype=I32)[None, :],
                0, CHUNK - 1)]                           # (N, k)
            regs = []
            kmr = kmer
            for j2 in range(1, k + 1):
                kmr = add_nuc32(kmr, win[:, j2 - 1], k)
                regs.append(kmr)
            fall = probe(jnp.stack(regs))                # (k, N)
            km = kmer
            j = jnp.zeros_like(i)
            done = jnp.zeros(i.shape, bool)
            for j2 in range(1, k + 1):
                at_end = jnp.int32(j2) >= rem
                step = ~done
                adv = step & ~at_end
                f = adv & fall[j2 - 1]
                j = jnp.where(step, jnp.int32(j2), j)
                km = jnp.where(adv, regs[j2 - 1], km)
                done = done | (step & (at_end | f))
            q = nv[jnp.clip(i + k + 1, 0, CHUNK - 1)]
            okq = (i + k + 1 < CHUNK) & (q < length)
            j_jump = jnp.where(okq, q - i, rem)
            end_idx = jnp.where(okq, q,
                                jnp.where(rem >= 2, i + rem - 1, i))
            km_jump = kmers[jnp.clip(end_idx, 0, CHUNK - 1)]
            j = jnp.where(done, j, j_jump)
            km = jnp.where(done, km, km_jump)
            return j, km

        if strategy == "one":
            att_a = make_one_attempt32_arr(probe, codes, k, c)

            def attempt_block(i, reg, lenf, enabled):
                return att_a(i, reg, lenf)
        elif strategy == "two":
            att_v = jax.vmap(make_two_attempt32(probe, codes, k, c))

            def attempt_block(i, reg, lenf, enabled):
                return att_v(i, reg, lenf)
        elif strategy == "greedy":
            attempt_block = make_greedy_attempt32_arr(probe, codes, k, ms,
                                                      nb)
        elif strategy == "graph":
            attempt_block = make_graph_attempt32_arr(probe, codes, k,
                                                     err_fn, wp)
        elif strategy == "gap-size":
            attempt_block = make_gap_attempt32_arr(probe, codes, k, c,
                                                   err_fn, wp)
        elif strategy == "ladder":
            attempt_block = make_ladder_attempt32(probe, codes, k, c, ms,
                                                  nb, err_fn, wp)
        else:
            raise ValueError(strategy)

        def dirty_sim(i0, reg0, prev0, t0, lenf):
            """Absorb until k steps since the last applied repair
            (engine2.dirty_sim without resync boundaries).  Returns
            (state, i, reg, t): DONE_PURE / DONE_END / PENDING; for
            PENDING (i, reg, t) is the nested attempt site.

            Batched-window form (r5, see err_fn): one (N, k) code
            gather + one batched probe; a lane's absorption path is
            continuous from i0 until its stop step, so prospective
            registers select exactly."""
            win = codes[jnp.clip(
                i0[:, None] + jnp.arange(k, dtype=I32)[None, :],
                0, CHUNK - 1)]                           # (N, k)
            regs = []
            kmr = reg0
            for m in range(k):
                kmr = add_nuc32(kmr, win[:, m], k)
                regs.append(kmr)
            vall = probe(jnp.stack(regs))                # (k, N)
            i, reg, prev, t = i0, reg0, prev0, t0
            state = jnp.full(jnp.shape(i0), -1, dtype=I32)  # -1 = running
            for m in range(k):
                running = state < 0
                step_on = running & (t < k)
                state = jnp.where(running & ~step_on, DONE_PURE, state)
                end_read = i >= lenf
                state = jnp.where(step_on & end_read, DONE_END, state)
                act = step_on & ~end_read
                v = vall[m]
                nested = act & ~v & prev
                state = jnp.where(nested, PENDING, state)
                adv = act & ~nested
                reg = jnp.where(act, regs[m], reg)
                prev = jnp.where(adv, v, prev)
                i = jnp.where(adv, i + 1, i)
                t = jnp.where(adv, t + 1, t)
            state = jnp.where(state < 0, DONE_PURE, state)
            t = jnp.where(state == PENDING, t + 1, t)
            return state, i, reg, t

        # ---------------- 2. site-block queue ---------------------------
        # Kernel-merged layout (r5): queue-body ops at blk lanes are
        # materialization-bound (~8-16 ns/lane per DISTINCT op through
        # HBM), so the per-block scatters/gathers are packed:
        #   recb (NS*SLOTS, 3+EW) u32  — [rp | rc | rs | re...] in ONE
        #       .set scatter (indices are unique: one queue item per
        #       site per generation, slot increments per applied record)
        #   sstat (NS, 3) i32          — [succ_pos, s_pos, -s_cap] in
        #       ONE .min scatter (max(code) == -min(-code); masked
        #       lanes write the min-identity BIG/0 instead of dropping)
        #   appq (NQA+blk, AW) u32     — pending-continuation rows
        #       [sid, i, t, slot, reg-words], ONE row gather per block
        #       and ONE dynamic_update_slice per append
        RW = 1 if k <= 15 else 2     # reg words in an appq row
        AW = 4 + RW

        def _reg_to_words(reg):
            if k <= 15:
                return reg[:, None]
            return jax.lax.bitcast_convert_type(reg, U32)

        def _words_to_reg(wordz):
            if k <= 15:
                return wordz[:, 0]
            return jax.lax.bitcast_convert_type(wordz, jnp.uint64)

        def queue_body(st):
            head, iterc, napp, sstat, recb, appq = st
            total = n_eff + napp

            q = head + jnp.arange(blk, dtype=I32)
            act = q < total
            from_site = act & (q < n_eff)
            posA = jnp.clip(_lower_bound(cumT, q + 1), 0, CHUNK - 1)
            ai = jnp.clip(q - n_eff, 0, NQA - 1)

            arow = appq[ai]                              # (blk, AW)
            sid = jnp.where(from_site, q, arow[:, 0].astype(I32))
            i_cur = jnp.where(from_site, posA, arow[:, 1].astype(I32))
            reg = jnp.where(from_site, kmers[posA],
                            _words_to_reg(arow[:, 4 : 4 + RW]))
            t = jnp.where(from_site, k, arow[:, 2].astype(I32))
            slot = jnp.where(from_site, 0, arow[:, 3].astype(I32))
            i_cur = jnp.clip(i_cur, 0, CHUNK - 1)
            lenf = endf_of[i_cur]
            sidc = jnp.clip(sid, 0, NS - 1)

            # gate: exactly-one-alternative (shared by every strategy)
            nalts, _corr = _alt_info32_arr(probe, reg)
            gate = act & (nalts == 1)

            res = attempt_block(i_cur, reg, lenf, gate)
            applied = gate & res.ok & ~res.cap
            att_cap = gate & res.cap

            # records: one packed .set (indices unique, see above)
            widx = jnp.where(applied & (slot < SLOTS),
                             sidc * SLOTS + jnp.clip(slot, 0, SLOTS - 1),
                             NS * SLOTS)
            rrow = jnp.concatenate(
                [i_cur.astype(U32)[:, None],
                 res.cnt.astype(U32)[:, None],
                 res.consumed.astype(U32)[:, None],
                 res.emit.astype(U32)], axis=1)          # (blk, 3+EW)
            recb = recb.at[widx].set(rrow, mode="drop")
            slot_over = applied & (slot >= SLOTS)

            # merged post-state simulation (applied and failed lanes)
            sim_i = jnp.where(applied, i_cur + res.consumed.astype(I32),
                              i_cur + 1)
            sim_reg = jnp.where(applied, res.new_kmer, reg)
            sim_t = jnp.where(applied, 0, t)
            state, i_n, reg_n, t_n = dirty_sim(
                sim_i, sim_reg, applied, sim_t, lenf)
            bad = att_cap | slot_over

            # successor (resolved chains) + first-visit position + cap
            # reason, one packed min-scatter
            done_pure = act & ~bad & (state == DONE_PURE)
            sp = nt[jnp.clip(i_n, 0, CHUNK - 1)]
            sp_ok = done_pure & (i_n < CHUNK) & (sp < lenf)
            cap_code = jnp.maximum(jnp.where(att_cap, CAP_ATTEMPT, 0),
                                   jnp.where(slot_over, CAP_OVERFLOW, 0))
            srow = jnp.stack(
                [jnp.where(sp_ok, sp, BIG),
                 jnp.where(from_site, posA, BIG),
                 -jnp.where(act, cap_code, 0)], axis=1)  # (blk, 3)
            sstat = sstat.at[sidc].min(srow)

            # pending continuations -> append to the queue
            pend = act & ~bad & (state == PENDING)
            slot_n = slot + applied.astype(I32)
            p_all = jnp.concatenate(
                [sid.astype(U32)[:, None], i_n.astype(U32)[:, None],
                 t_n.astype(U32)[:, None], slot_n.astype(U32)[:, None],
                 _reg_to_words(reg_n)], axis=1)          # (blk, AW)
            (p_mat,), okm, _over = _compact(pend, (p_all,), blk)
            npend = jnp.sum(pend.astype(I32), dtype=I32)
            over_q = okm & (napp + jnp.arange(blk, dtype=I32) >= NQA)
            p_sid = p_mat[:, 0].astype(I32)
            sstat = sstat.at[jnp.clip(p_sid, 0, NS - 1), 2].min(
                jnp.where(over_q, -CAP_OVERFLOW, 0))
            wat = (jnp.minimum(napp, NQA), jnp.int32(0))
            appq = jax.lax.dynamic_update_slice(appq, p_mat, wat)
            napp = jnp.minimum(napp + npend, NQA)

            # the block covered queue positions [head, min(head+blk,
            # total)); same-iteration appends land at >= total and are
            # picked up by the next iteration.
            return (jnp.minimum(head + blk, total), iterc + 1, napp,
                    sstat, recb, appq)

        def queue_cond(st):
            head, iterc, napp = st[0], st[1], st[2]
            return (head < n_eff + napp) & (iterc < MAXB)

        recb0 = jnp.zeros((NS * SLOTS, 3 + EW), U32).at[:, 0].set(
            jnp.uint32(BIG))
        sstat0 = jnp.stack([jnp.full(NS, BIG, I32),
                            jnp.full(NS, BIG, I32),
                            jnp.zeros(NS, I32)], axis=1)
        st0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
               sstat0, recb0, jnp.zeros((NQA + blk, AW), U32))
        st = jax.lax.while_loop(queue_cond, queue_body, st0)
        (head, _iterc, napp, sstat, recb, appq) = st
        succ_pos = sstat[:, 0]
        s_pos = sstat[:, 1]
        s_cap = -sstat[:, 2]
        rp = recb[:, 0].astype(I32)
        rc = recb[:, 1].astype(I32)
        rs = recb[:, 2].astype(I32)
        re = recb[:, 3:]
        app_sid = appq[:, 0].astype(I32)

        # queue exhausted with work left -> cap those sites
        sids = jnp.arange(NS, dtype=I32)
        s_cap = jnp.maximum(
            s_cap, jnp.where((sids >= head) & (sids < n_eff),
                             CAP_ROUNDS, 0))
        jq = jnp.arange(NQA + blk, dtype=I32)
        unproc = (jq + n_eff >= head) & (jq < napp)
        s_cap = s_cap.at[jnp.clip(app_sid, 0, NS - 1)].max(
            jnp.where(unproc, CAP_ROUNDS, 0))

        if _cut == "queue":
            # stage-bisect: consume the queue products so XLA keeps them
            aux0 = jnp.stack([
                n_eff, head, napp,
                jnp.sum(s_cap, dtype=I32),
                jnp.sum(jnp.minimum(succ_pos, BIG), dtype=I32) & 0xFFFF,
                jnp.sum(rc, dtype=I32) + jnp.sum(rs, dtype=I32)
                + jnp.sum(re.astype(I32), dtype=I32)
                + (jnp.sum(jnp.minimum(rp, BIG), dtype=I32) & 0xFFFF),
                jnp.sum(jnp.minimum(s_pos, BIG), dtype=I32) & 0xFFFF,
                jnp.minimum(n_sites, BIG)])
            return codes, rlen, cap_read, aux0

        # ---------------- 3. whole-read chain walk ----------------------
        s_ok = s_pos < BIG
        succ_idx = jnp.where(
            succ_pos < BIG,
            cumT[jnp.clip(succ_pos, 0, CHUNK - 1)] - 1, NS)
        J = jnp.append(jnp.clip(succ_idx, 0, NS), jnp.int32(NS))
        jumps = [J]
        for _ in range(LV - 1):
            J = J[J]
            jumps.append(J)

        hpos = nt[jnp.clip(rstart, 0, CHUNK - 1)]
        h_ok = (rlen > 0) & (hpos < rend)
        head_idx = jnp.where(
            h_ok, cumT[jnp.clip(hpos, 0, CHUNK - 1)] - 1, NS)

        s_rid = jnp.clip(_lower_bound(rstart, s_pos + 1) - 1, 0, R - 1)
        x = jnp.clip(head_idx[s_rid], 0, NS)
        for lv in reversed(range(LV)):
            x2 = jumps[lv][x]
            x = jnp.where(x2 <= sids, x2, x)
        visited = s_ok & (x == sids)

        # any capped site caps its read (a capped site may break the
        # chain, making downstream visited-ness unreliable)
        site_capped = s_ok & (s_cap > 0)
        cap_read = cap_read.at[s_rid].max(site_capped)

        # ---------------- 4. splice -------------------------------------
        rv = (rp < BIG) & jnp.repeat(visited, SLOTS)
        (crp, crc, crs, cre), rok, rover = _compact(
            rv, (rp, rc, rs, re), NR)
        # compaction overflow caps the site's read (site-level reduce is
        # NS-sized; the old form gathered rid at NS*SLOTS positions)
        rover_site = jnp.any(rover.reshape(NS, SLOTS), axis=1)
        cap_read = cap_read.at[s_rid].max(rover_site)
        crp = jnp.where(rok, crp, BIG)

        rlane = jnp.where(rok, rid[jnp.clip(crp, 0, CHUNK - 1)], R - 1)
        rcap = jnp.append(rstart[1:], jnp.int32(CHUNK)) - rstart
        rlo = _lower_bound(crp, rstart)                  # (R,)
        rhi = _lower_bound(crp, rstart + rcap)           # (R,)
        ridx = jnp.arange(NR, dtype=I32)
        is_first = ridx == rlo[rlane]
        pidx = jnp.clip(ridx - 1, 0, NR - 1)
        pe = jnp.where(is_first, rstart[rlane], crp[pidx] + crs[pidx])
        vlen = crp - pe
        cap_read = cap_read.at[rlane].max(rok & (vlen < 0))
        vlen = jnp.clip(vlen, 0, CHUNK)
        slen = jnp.where(rok, vlen + crc, 0)

        Sx = jnp.concatenate(
            [jnp.zeros(1, I32), jnp.cumsum(slen, dtype=I32)])       # (NR+1,)
        SxLo = Sx[rlo]                                   # (R,)
        ostart_v = Sx[ridx] - SxLo[rlane]
        body_len = Sx[rhi] - SxLo                        # (R,)
        has_rec = rhi > rlo
        lastx = jnp.clip(rhi - 1, 0, NR - 1)
        last_end = jnp.where(has_rec, crp[lastx] + crs[lastx], rstart)
        tail_len = rend - last_end
        out_len = body_len + tail_len
        cap_read = cap_read | ((rlen > 0) &
                               ((out_len > rcap) | (tail_len < 0)))
        out_len = jnp.where(rlen > 0, jnp.clip(out_len, 0, rcap), 0)

        # ---- unified splice-source fill (one scatter-add + one cumsum,
        # ZERO dense gathers besides the final combined gather) ----
        #
        # Every output position reads `concat(codes, emit-table)[pos-S]`
        # where S is a per-segment constant: verbatim seg j of a read
        # has S = pos_v_j - pe_j, the emit seg of record j (at compacted
        # index j) has S = pos_e_j - (CHUNK + j*W) so that pos - S lands
        # at the record's unpacked emit words, and the tail has
        # S = pos_t - last_end.  S is built by scattering per-boundary
        # DELTAS (each boundary knows its predecessor segment's S
        # analytically) and integrating with cumsum.  Per-read delta
        # sums telescope to S_tail(r) - S_tail(r-1) independent of WHERE
        # the deltas land inside the read, so scatter indices are
        # clipped INTO the read span (never dropped): a capped read can
        # only corrupt its own span, and its cap flag routes it to the
        # host oracle.
        W = EW * BPW
        rcap_l = rcap[rlane]
        pos_v = rstart[rlane] + ostart_v
        pos_e = pos_v + vlen
        pos_t = rstart + body_len
        # analytic S values per segment
        s_v = pos_v - pe
        s_e = pos_e - (CHUNK + ridx * W)
        s_tail = pos_t - last_end                        # (R,)
        # predecessor S: for a first record, the previous slot's tail;
        # for later records, the previous record's emit segment.
        prev_tail = jnp.concatenate([jnp.zeros(1, I32), s_tail[:-1]])
        s_pred_v = jnp.where(is_first, prev_tail[rlane], s_e[pidx])
        d_v = jnp.where(rok, s_v - s_pred_v, 0)
        d_e = jnp.where(rok, s_e - s_v, 0)
        s_last = jnp.where(has_rec, s_e[lastx], prev_tail)
        d_t = jnp.where(rlen > 0, s_tail - s_last, 0)
        # clip indices into the owning read's span (see above)
        iv = jnp.where(rok, jnp.clip(pos_v, rstart[rlane],
                                     rstart[rlane] + rcap_l - 1), CHUNK)
        ie = jnp.where(rok, jnp.clip(pos_e, rstart[rlane],
                                     rstart[rlane] + rcap_l - 1), CHUNK)
        it = jnp.where(rlen > 0,
                       jnp.clip(pos_t, rstart, rstart + rcap - 1), CHUNK)
        delta = jnp.zeros(CHUNK, I32).at[
            jnp.concatenate([iv, ie, it])].add(
            jnp.concatenate([d_v, d_e, d_t]), mode="drop")
        S = jnp.cumsum(delta, dtype=I32)
        gidx = jnp.clip(pos - S, 0, CHUNK + NR * W - 1)
        etable = ((cre[:, :, None]
                   >> (_u(2) * jnp.arange(BPW, dtype=U32)[None, None, :]))
                  & _u(3)).astype(U8).reshape(NR * W)
        # the combined gather carries the validity bit positionally
        # (emit-table entries have bit 2 = 0; their spans are dirty)
        cv = codes | (Vraw.astype(U8) << U8(2))
        out = jnp.concatenate([cv, etable])[gidx]

        # ---- dirty-window list for the NEXT pass's sparse re-probe ----
        # (emit_dirty only; see the docstring's measured-and-off note.)
        # Two windows per applied record: the verbatim-start boundary
        # [pos_v, pos_v+k-1) and the emitted span + its trailing
        # boundary [pos_e, pos_e+crc+k-1) (which also covers the next
        # verbatim segment's start window, since it begins at
        # pos_e+crc).  Capped reads may list garbage positions — the
        # fix-up only ever scatters TRUE probe values, so spurious
        # entries are harmless anywhere.
        if not emit_dirty:
            dlist_out = jnp.zeros(1, I32)
            dcnt_out = jnp.int32(-1)
        else:
            wv = jnp.where(rok, k - 1, 0)
            we = jnp.where(rok, jnp.clip(crc, 0, W) + (k - 1), 0)
            wall = jnp.stack([wv, we], 1).reshape(2 * NR)
            dbase = jnp.stack([jnp.clip(pos_v, 0, CHUNK - 1),
                               jnp.clip(pos_e, 0, CHUNK - 1)], 1).reshape(
                2 * NR)
            cumw = jnp.cumsum(wall, dtype=I32)
            cumw_ex = jnp.concatenate([jnp.zeros(1, I32), cumw[:-1]])
            ndirty = cumw[-1]
            lanes_d = jnp.arange(ND, dtype=I32)
            marks = jnp.zeros(ND, I32).at[
                jnp.where(wall > 0, jnp.minimum(cumw_ex, ND), ND)].add(
                1, mode="drop")
            rec_of = jnp.clip(jnp.cumsum(marks, dtype=I32) - 1, 0,
                              2 * NR - 1)
            doff = lanes_d - cumw_ex[rec_of]
            dpos = dbase[rec_of] + doff
            dlist_out = jnp.where(lanes_d < jnp.minimum(ndirty, ND),
                                  jnp.clip(dpos, 0, CHUNK - 1), CHUNK)
            dcnt_out = jnp.where(ndirty > ND, -1, ndirty)

        def _cnt(m):
            return jnp.sum(m.astype(I32), dtype=I32)

        aux = jnp.stack([
            n_eff,
            _cnt(site_capped & (s_cap == CAP_OVERFLOW)),
            _cnt(site_capped & (s_cap == CAP_ATTEMPT)),
            _cnt(site_capped & (s_cap == CAP_ROUNDS)),
            _cnt(visited),
            _cnt(rok),
            _cnt(cap_read),
            jnp.minimum(n_sites, BIG),
        ])
        if _debug:
            dbg = dict(V=V, T=T, n_sites=n_sites, s_pos=s_pos,
                       s_cap=s_cap, succ_pos=succ_pos, visited=visited,
                       rp=rp, rc=rc, rs=rs, crp=crp, crc=crc, crs=crs,
                       rok=rok, head_idx=head_idx, succ_idx=succ_idx,
                       ostart_v=ostart_v, vlen=vlen, body_len=body_len,
                       shift=S, gidx=gidx, out_code=out,
                       dlist=dlist_out, dcnt=dcnt_out)
            return out, out_len, cap_read, aux, dbg
        return out, out_len, cap_read, aux, dlist_out, dcnt_out

    if not carry:
        full = passfn

        def passfn(table, codesV, rstart, rlen):  # noqa: F811
            return full(table, codesV, rstart, rlen)

    if batch:
        # chunk-batched pass (r5): vmap the whole pass over a leading
        # axis of independent chunks so the lane-scale queue/chain/record
        # ops —
        # which are op-count-floor-bound (~16 us per small op on the
        # relay), not element-bound — amortize their floor across
        # chunks.  Element-bound work (probe, splice gather, scans)
        # scales linearly, so this trades nothing away.  The while_loop
        # bodies are mask-idempotent for finished chunks, which is what
        # vmapped while_loops require.
        axes = (None, 0, 0, 0) + ((0, 0) if carry else ())
        return jax.jit(jax.vmap(passfn, in_axes=axes))
    return jax.jit(passfn)


def make_reverse3_fn(CHUNK: int, R: int, batch: bool = False):
    """Jitted in-slot reversal of the length-n prefix of every read (the
    two-side reverse pass works on plain-reversed bytes,
    src/lib.rs:110-117).  u8 codes in/out; one gather."""
    assert R * 2 * CHUNK < (1 << 31)

    def rev(codes, rstart, rlen):
        pos = jnp.arange(CHUNK, dtype=I32)
        # delta-scatter + cumsum fills (cummax is pathological on this
        # stack — see make_pass3_fn)
        LSH = 2 * CHUNK
        slotkey = jnp.arange(R, dtype=I32) * LSH + rlen
        kd = slotkey - jnp.concatenate([jnp.zeros(1, I32), slotkey[:-1]])
        key = jnp.cumsum(
            jnp.zeros(CHUNK, I32).at[rstart].add(kd, mode="drop"),
            dtype=I32)
        len_of = key % LSH
        sd = rstart - jnp.concatenate([jnp.zeros(1, I32), rstart[:-1]])
        start_of = jnp.cumsum(
            jnp.zeros(CHUNK, I32).at[rstart].add(sd, mode="drop"),
            dtype=I32)
        opin = pos - start_of
        src = jnp.where(opin < len_of,
                        start_of + len_of - 1 - opin, pos)
        return codes[jnp.clip(src, 0, CHUNK - 1)]

    if batch:
        return jax.jit(jax.vmap(rev))
    return jax.jit(rev)


def make_unpack3_fn(CHUNK: int):
    """packed (CHUNK//4,) u8 -> codes (CHUNK,) u8 (chain entry)."""

    @jax.jit
    def up(packed):
        return dc.unpack_codes(packed, CHUNK)

    return up


def make_pack3_fn(CHUNK: int):
    """codesV (CHUNK,) u8 -> packed (CHUNK//4,) u8 (chain exit; keeps
    the device->host transfer at 2 bits/base; strips the carried
    validity bit)."""

    @jax.jit
    def pk(codes):
        return dc.pack_codes(codes & jnp.uint8(3))

    return pk


# ---------------------------------------------------------------------------
# Batch driver: flat chunk packing, 2-bit packed device IO.
# ---------------------------------------------------------------------------

_PURE_LUT = np.zeros(256, dtype=bool)
_PURE_LUT[[65, 67, 71, 84]] = True  # 'A' 'C' 'G' 'T'
_DECODE = np.frombuffer(b"ACTG", dtype=np.uint8)

#: process-wide compiled-program cache (correctors share pass programs;
#: the jax in this image cannot use the persistent on-disk cache, see
#: device_codec).
_FN_CACHE: dict = {}


class Tpu3Corrector:
    """Flat-packed batched device corrector (engine v3).

    Same public contract as the v1/v2 correctors (bit-exact,
    cap -> exact host-oracle fallback); ONE compiled program per
    strategy plus one reversal program, reused for every batch."""

    #: flat positions per chunk (static; one XLA program shape).
    #: Measured e2e on the corpus (full chain + reverse, steady state,
    #: r4): 2^18 -> 6.9 s, 2^19 -> 4.6 s (44.7 reads/s), 2^20 -> 4.27 s
    #: (48.2 reads/s) — per-chunk fixed costs amortize with chunk size.
    #: 2^20 cold-compiles at ~366 s total, which the persistent compile
    #: cache (device_codec) reduces to a one-time cost.
    CHUNK = 1 << 20
    #: read slots per chunk
    R = 512
    #: max chunks batched through one vmapped chain program.  MEASURED
    #: AND REJECTED at 4 (BENCH 79.5 -> 59.6 reads/s): lane-scale queue
    #: ops are byte-bound beyond ~2048 lanes (same finding as the
    #: blk-width sweep), so vmap's wider ops at max-trips cost MORE than
    #: separate per-chunk programs.  Kept at 1 (per-chunk dispatch); the
    #: vmapped path remains for future stacks where small-op floors
    #: dominate.
    NC_MAX = 1

    def __init__(self, valid_kmer, corrections, confirm: int,
                 max_search: int, chunk: int | None = None,
                 nreads: int | None = None, fused: bool | None = None,
                 table=None, walk_max: int = WALK_MAX):
        from br_tpu.set.solid import SolidSet

        _check_k(valid_kmer.k)
        if not isinstance(valid_kmer, SolidSet):
            raise TypeError("engine3 requires a SolidSet (k <= 17); "
                            "use the v2 engine for hash sets")
        self.k = valid_kmer.k
        self.c = confirm
        self.ms = max_search
        self.corrections = [s.lower().replace("_", "-")
                            for s in corrections]
        # The reference applies each strategy as a FULL-READ pass in
        # sequence: `methods.iter().for_each(|x| correct = x.correct(..))`
        # (/root/reference/src/lib.rs:106-108).  That cascade is what we
        # run by default — it is the bit-exact semantics.  `fused=True`
        # opts into the experimental per-site first-success ladder
        # (make_ladder_attempt32), which pays the dense/chain/splice
        # stages once per direction instead of five times but is only
        # equivalent to the cascade when repair windows cannot span the
        # next error site; it diverges on repeat-rich real reads
        # (measured: 50/80 corpus reads at k=11).  Never the default.
        if fused is None:
            fused = False
        elif fused and tuple(self.corrections) != LADDER_CHAIN:
            raise ValueError("fused=True requires the full default chain")
        self._chain_plan = ["ladder"] if fused else self.corrections
        self.valid_kmer = valid_kmer
        # `table` lets a device-built bitfield (set/device_build.py) skip
        # the host->device transfer — decisive at k=17 (1 GiB over a
        # ~30 MB/s link); it must match device_words() layout.
        self.table = (jax.device_put(valid_kmer.device_words())
                      if table is None else table)
        if chunk is not None:
            self.CHUNK = chunk
        if nreads is not None:
            self.R = nreads
        #: walk-profile bound (see WalkProfile); reads whose walks CAP
        #: under the default profile retry on a lazily-built WIDE-profile
        #: sibling before falling back to the host oracle.
        self.walk_max = walk_max
        self._wide = None
        self._oracle = None
        #: optional jax.sharding.Mesh with a "dp" axis (see
        #: br_tpu.parallel); chunks are then grouped and sharded.
        self.mesh = None

    # -- planning -----------------------------------------------------------

    def _slot_len(self, n: int) -> int:
        # net-insertion headroom; overflow -> cap (-> wide retry).  The
        # wide profile budgets a full walk emit of headroom so a long
        # accepted walk cannot re-cap on slot overflow.
        slack = max(64, n // 8)
        if self.walk_max > WALK_MAX:
            slack = max(slack, self.walk_max + 64)
        s = n + slack
        return s + (-s) % 32

    def _plan(self, seqs, skip):
        """Pack read indices into chunks of <= CHUNK positions / R slots.

        Returns [(idxs, rstarts)] per chunk."""
        plans = []
        cur_idx, cur_starts, off = [], [], 0
        for i, s in enumerate(seqs):
            if i in skip:
                continue
            sl = self._slot_len(len(s))
            if sl > self.CHUNK:
                skip.add(i)  # absurdly long read -> host oracle
                continue
            if off + sl > self.CHUNK or len(cur_idx) >= self.R:
                plans.append((cur_idx, cur_starts))
                cur_idx, cur_starts, off = [], [], 0
            cur_idx.append(i)
            cur_starts.append(off)
            off += sl
        if cur_idx:
            plans.append((cur_idx, cur_starts))
        return plans

    # -- compiled program lookup --------------------------------------------

    def _get_pass(self, strategy: str, batch: bool = False,
                  carry: bool = False, emit_dirty: bool = False):
        key = ("v3", strategy, self.k, self.c, self.ms, self.CHUNK,
               self.R, self.walk_max, batch, carry, emit_dirty)
        fn = _FN_CACHE.get(key)
        if fn is None:
            fn = make_pass3_fn(self.k, strategy, self.c, self.ms, self.c,
                               self.CHUNK, self.R,
                               walk_max=self.walk_max, batch=batch,
                               carry=carry, emit_dirty=emit_dirty)
            _FN_CACHE[key] = fn
        return fn

    def _get_wide(self):
        """Wide-walk-profile sibling corrector for capped-read retries
        (shares the device bitfield; small chunk keeps its one-time
        compile cheap)."""
        if self._wide is None:
            self._wide = Tpu3Corrector(
                self.valid_kmer, self.corrections, self.c, self.ms,
                chunk=min(self.CHUNK, 1 << 18),
                nreads=min(self.R, 32), table=self.table,
                walk_max=WIDE_WALK_MAX)
        return self._wide

    def _get_reverse(self, batch: bool = False):
        key = ("v3rev", self.CHUNK, self.R, batch)
        fn = _FN_CACHE.get(key)
        if fn is None:
            fn = make_reverse3_fn(self.CHUNK, self.R, batch=batch)
            _FN_CACHE[key] = fn
        return fn

    def _get_unpack(self):
        key = ("v3up", self.CHUNK)
        fn = _FN_CACHE.get(key)
        if fn is None:
            fn = make_unpack3_fn(self.CHUNK)
            _FN_CACHE[key] = fn
        return fn

    def _get_pack(self):
        key = ("v3pk", self.CHUNK)
        fn = _FN_CACHE.get(key)
        if fn is None:
            fn = make_pack3_fn(self.CHUNK)
            _FN_CACHE[key] = fn
        return fn

    # -- the public batch interface ------------------------------------------

    def warmup(self, two_side: bool, parallel: bool = True, nc: int = 1):
        """Compile every program the chain needs (optionally with both
        host cores); call before timing or to overlap with host work.
        ``nc`` must match the chunk-group width of the coming batch
        (min(n_chunks, NC_MAX)) for the compile to be reused."""
        from concurrent.futures import ThreadPoolExecutor

        CHUNK, R = self.CHUNK, self.R
        batch = nc > 1
        shp = (nc,) if batch else ()
        codes = jax.device_put(np.zeros(shp + (CHUNK,), np.uint8))
        rstart = np.full(shp + (R,), CHUNK, np.int32)
        rstart[..., 0] = 0
        rlen = np.zeros(shp + (R,), np.int32)
        rlen[..., 0] = 256
        args = (codes, jax.device_put(rstart), jax.device_put(rlen))
        packed = jax.device_put(np.zeros(shp + (CHUNK // 4,), np.uint8))

        # (fn, lowering args) with explicit signatures
        jobs = [(self._get_pass(st, batch=batch), (self.table, *args))
                for st in self._chain_plan]
        if not two_side:
            jobs.append((self._get_reverse(batch=batch), args))
        jobs.append((self._get_unpack(), (packed,)))
        jobs.append((self._get_pack(), (codes,)))

        def compile_one(job):
            fn, a = job
            fn.lower(*a).compile()

        if parallel:
            with ThreadPoolExecutor(2) as ex:
                list(ex.map(compile_one, jobs))
        else:
            for job in jobs:
                compile_one(job)

    def correct_batch(self, seqs, two_side: bool):
        import os
        import time as _time

        timeline = os.environ.get("BR_TPU_TIMELINE")
        t0 = _time.perf_counter()
        out = [None] * len(seqs)
        impure = {
            i for i, s in enumerate(seqs)
            if not _PURE_LUT[np.frombuffer(s, np.uint8)].all()
        }
        n_impure = len(impure)
        plans = self._plan(seqs, impure)
        t1 = _time.perf_counter()
        if self.mesh is not None:
            handles = self._dispatch_sharded(seqs, plans, two_side)
        elif self.NC_MAX > 1 and len(plans) > 1:
            # chunk-batched dispatch (opt-in via NC_MAX, see note there)
            NC = min(len(plans), self.NC_MAX)
            handles = []
            for lo in range(0, len(plans), NC):
                handles.extend(self._dispatch_group(
                    seqs, plans[lo : lo + NC], two_side, NC))
        else:
            handles = [self._dispatch_chunk(seqs, idxs, starts, two_side)
                       for idxs, starts in plans]
        t2 = _time.perf_counter()
        fb_idx = sorted(impure)
        capped_idx = []
        # one consolidated fetch per array kind: the device->host round
        # trip costs ~25 ms each on the tunnel, so 3 fetches beat
        # 3-per-chunk by ~0.7 s on the 12-chunk corpus
        if handles:
            a_all = np.asarray(jnp.stack([h[0] for h in handles]))
            n_all = np.asarray(jnp.stack([h[1] for h in handles]))
            cap_all = np.asarray(jnp.stack([h[2] for h in handles]))
        t3 = _time.perf_counter()
        for ci, (idxs, starts) in enumerate(plans):
            a_np, n_np, cap_np = a_all[ci], n_all[ci], cap_all[ci]
            codes = np.empty(a_np.shape[0] * 4, np.uint8)
            for sh in range(4):
                codes[sh::4] = (a_np >> (2 * sh)) & 3
            for b, i in enumerate(idxs):
                if cap_np[b]:
                    capped_idx.append(i)
                else:
                    lo = starts[b]
                    out[i] = _DECODE[codes[lo : lo + n_np[b]]].tobytes()
        # Wide-profile device retry (r5): reads capped under the default
        # walk profile (true accepts past WALK_MAX, gap fills past the
        # emit buffer) re-run on a wide-emit sibling chain — same
        # cascade semantics, bigger engineering bounds — so they stay on
        # device; only reads the WIDE profile also caps reach the host.
        n_retried = 0
        host_capped = len(capped_idx)
        if (capped_idx and self.walk_max == WALK_MAX
                and self._chain_plan == self.corrections):
            wide = self._get_wide()
            fixed = wide.correct_batch(
                [seqs[i] for i in capped_idx], two_side)
            for i, s in zip(capped_idx, fixed):
                out[i] = s
            n_retried = len(capped_idx)
            host_capped = wide.last_stats["fallback"]
        else:
            fb_idx.extend(capped_idx)
        #: auditable host/device split for the last batch (VERDICT r3
        #: item 4): reads the device could not finish (capped, after the
        #: wide retry) plus reads never sent (impure bytes) are
        #: re-corrected on the host.
        self.last_stats = {
            "total": len(seqs),
            "fallback": n_impure + host_capped,
            "impure": n_impure,
            "capped": host_capped,
            "wide_retried": n_retried,
        }
        if fb_idx:
            fixed = self._oracle_correct_many(
                [seqs[i] for i in fb_idx], two_side)
            for i, s in zip(fb_idx, fixed):
                out[i] = s
        if timeline:
            t4 = _time.perf_counter()
            print(f"[timeline] plan {1e3*(t1-t0):.0f}  dispatch "
                  f"{1e3*(t2-t1):.0f}  fetch {1e3*(t3-t2):.0f}  "
                  f"decode+retry+oracle {1e3*(t4-t3):.0f} ms",
                  flush=True)
        return out

    def _chunk_arrays(self, seqs, idxs, starts):
        """Host-side packing of one chunk: 2-bit codes + slot tables."""
        CHUNK, R = self.CHUNK, self.R
        codes = np.zeros(CHUNK, dtype=np.uint8)
        rstart = np.full(R, CHUNK, dtype=np.int32)
        rlen = np.zeros(R, dtype=np.int32)
        for b, (i, lo) in enumerate(zip(idxs, starts)):
            arr = np.frombuffer(seqs[i], dtype=np.uint8)
            codes[lo : lo + len(arr)] = (arr >> 1) & 3
            rstart[b] = lo
            rlen[b] = len(arr)
        # unused trailing slots: keep rstart sorted (sentinel CHUNK) and
        # give the last used slot its implied capacity.
        b4 = codes.reshape(CHUNK // 4, 4)
        packed = (b4[:, 0] | (b4[:, 1] << 2) | (b4[:, 2] << 4)
                  | (b4[:, 3] << 6))
        return packed, rstart, rlen

    def _dispatch_group(self, seqs, group, two_side: bool, NC: int):
        """Enqueue the full chain for NC chunks through the vmapped
        chain; returns per-chunk handles (packed, out_lens, cap).  Short
        groups are padded with empty chunks (rstart = CHUNK sentinel
        everywhere -> zero sites, zero-length outputs)."""
        arrs = [self._chunk_arrays(seqs, idxs, starts)
                for idxs, starts in group]
        while len(arrs) < NC:
            arrs.append((np.zeros(self.CHUNK // 4, np.uint8),
                         np.full(self.R, self.CHUNK, np.int32),
                         np.zeros(self.R, np.int32)))
        a = self._get_unpack()(
            jax.device_put(np.stack([x[0] for x in arrs])))
        rs = jax.device_put(np.stack([x[1] for x in arrs]))
        n = jax.device_put(np.stack([x[2] for x in arrs]))
        cap_any = jnp.zeros((NC, self.R), dtype=bool)
        rev_fn = self._get_reverse(batch=True)

        def run_chain(a, n, cap_any):
            for strat in self._chain_plan:
                fn = self._get_pass(strat, batch=True)
                a, n, cap, _aux, _dl, _dc = fn(self.table, a, rs, n)
                cap_any = cap_any | cap
            return a, n, cap_any

        a, n, cap_any = run_chain(a, n, cap_any)
        if not two_side:
            a = rev_fn(a, rs, n)
            a, n, cap_any = run_chain(a, n, cap_any)
            a = rev_fn(a, rs, n)
        pko = self._get_pack()(a)
        return [(pko[d], n[d], cap_any[d]) for d in range(len(group))]

    def _dispatch_chunk(self, seqs, idxs, starts, two_side: bool):
        """Enqueue the full chain for one chunk; returns device handles
        (packed codes, out_lens (R,), cap (R,)) without synchronizing.
        Transfers stay 2-bit packed in both directions; the chain itself
        runs on u8 codes (unpack/pack are device-side mini-programs)."""
        packed, rstart, rlen = self._chunk_arrays(seqs, idxs, starts)

        a = self._get_unpack()(jax.device_put(packed))
        rs = jax.device_put(rstart)
        n = jax.device_put(rlen)
        cap_any = jnp.zeros(self.R, dtype=bool)
        rev_fn = self._get_reverse()

        def run_chain(a, n, cap_any):
            # every pass dense-probes (carry=True measured SLOWER on
            # this stack — see make_pass3_fn's incremental-validity note)
            for strat in self._chain_plan:
                fn = self._get_pass(strat)
                a, n, cap, _aux, _dl, _dc = fn(self.table, a, rs, n)
                cap_any = cap_any | cap
            return a, n, cap_any

        a, n, cap_any = run_chain(a, n, cap_any)
        if not two_side:
            a = rev_fn(a, rs, n)
            a, n, cap_any = run_chain(a, n, cap_any)
            a = rev_fn(a, rs, n)
        return self._get_pack()(a), n, cap_any

    # -- multi-chip path (BASELINE config 5) ---------------------------------

    def _get_sharded_chain(self, two_side: bool):
        """shard_map'd full chain over the "dp" mesh: one flat chunk per
        device, bitfield replicated, no cross-device collectives in the
        correction phase (reads are independent)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        key = ("v3sh", id(self.mesh), two_side, self.CHUNK, self.R,
               tuple(self._chain_plan))
        fn = _FN_CACHE.get(key)
        if fn is not None:
            return fn

        mesh = self.mesh
        passfns = [self._get_pass(st) for st in self._chain_plan]
        rev_fn = self._get_reverse()

        def local_chain(table, a, rs, n):
            a, rs, n = a[0], rs[0], n[0]
            a = dc.unpack_codes(a, self.CHUNK)
            cap_any = jnp.zeros(self.R, dtype=bool)

            def run(a, n, cap_any):
                for pfn in passfns:
                    a, n, cap, _aux, _dl, _dc = pfn(table, a, rs, n)
                    cap_any = cap_any | cap
                return a, n, cap_any

            a, n, cap_any = run(a, n, cap_any)
            if not two_side:
                a = rev_fn(a, rs, n)
                a, n, cap_any = run(a, n, cap_any)
                a = rev_fn(a, rs, n)
            return dc.pack_codes(a & jnp.uint8(3))[None], n[None], \
                cap_any[None]

        # check_vma off: the local chain is collective-free (reads are
        # independent), and its while_loop carries mix invariant inits
        # with per-shard data, which the varying-axis checker rejects.
        sharded = jax.shard_map(
            local_chain, mesh=mesh,
            in_specs=(P(), P("dp", None), P("dp", None), P("dp", None)),
            out_specs=(P("dp", None), P("dp", None), P("dp", None)),
            check_vma=False)
        fn = jax.jit(sharded)
        _FN_CACHE[key] = fn
        return fn

    def _dispatch_sharded(self, seqs, plans, two_side: bool):
        """Group chunks into mesh-sized batches and run the sharded
        chain; returns per-plan handles like _dispatch_chunk."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        D = mesh.size
        self.table = jax.device_put(
            self.table, NamedSharding(mesh, P()))
        chain = self._get_sharded_chain(two_side)
        handles = []
        empty = (np.zeros(self.CHUNK // 4, np.uint8),
                 np.full(self.R, self.CHUNK, np.int32),
                 np.zeros(self.R, np.int32))
        for lo in range(0, len(plans), D):
            group = plans[lo : lo + D]
            arrs = [self._chunk_arrays(seqs, idxs, starts)
                    for idxs, starts in group]
            while len(arrs) < D:
                arrs.append(empty)
            pk = np.stack([a[0] for a in arrs])
            rs = np.stack([a[1] for a in arrs])
            rl = np.stack([a[2] for a in arrs])
            shard = NamedSharding(mesh, P("dp", None))
            a, n, cap = chain(self.table,
                              jax.device_put(pk, shard),
                              jax.device_put(rs, shard),
                              jax.device_put(rl, shard))
            for d in range(len(group)):
                handles.append((a[d], n[d], cap[d]))
        return handles

    def _oracle_correct_many(self, seqs, two_side: bool):
        if self._oracle is None:
            try:
                from br_tpu.native import NativeCorrector

                self._oracle = NativeCorrector(
                    self.valid_kmer, self.corrections, self.c, self.ms)
            except Exception:
                from br_tpu.correct import build_methods, correct_read

                methods = build_methods(self.corrections, self.valid_kmer,
                                        self.c, self.ms)

                class _Py:
                    def correct_batch(self, seqs, two_side):
                        return [correct_read(s, methods, two_side)
                                for s in seqs]

                self._oracle = _Py()
        return self._oracle.correct_batch(seqs, two_side)
