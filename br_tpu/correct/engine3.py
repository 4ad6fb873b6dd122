"""The v3 TPU correction engine: flat-packed, u32-pure, one program per
strategy.

Third redesign of the batched corrector, driven by two r2 measurements:

* **Compile wall** — the v2 bucketed engine compiles one program per
  (strategy, length-bucket) pair; the corpus needs ~30 programs at
  ~2-3 min each (XLA pathology: ANY u64 op in a module holding a
  computed-operand gather inflates compile ~15x; see
  scripts/compile_isolate*.py).  v3 packs every read of a chunk into ONE
  flat position buffer with per-read (start, len) tables, so each
  strategy is a single compiled program reused for every batch shape,
  and all k-mer math is uint32 (requires 2k <= 32, i.e. k <= 15 — the
  headline range; larger k falls back to the v2 engine).
* **Pad waste** — 2x length buckets waste ~25-50% of every chunk; flat
  packing wastes only the per-read splice slack (~12%).

Structure per pass (one strategy, one direction, ONE jitted program):

1. **Dense precompute** — codes, rolling u32 k-mers, validity bitmap V
   gated by per-position read bounds (``rstart``/``rend`` dense tables,
   built once per chunk by the prep program), transition bitmap T.
2. **Site compaction** — cumsum + branchless binary search, as v2.
3. **Block-adaptive attempts** — sites are processed in BLK-lane blocks
   inside a ``while_loop`` whose trip count is ``ceil(n_sites/BLK)``:
   per-pass attempt cost scales with the ACTUAL site count instead of
   the static capacity (v2 paid the full NS width every pass).
4. **Dirty-window queue** — repairs spawn dirty re-attempts; these go to
   a queue drained in blocks by a second while_loop (replaces v2's
   3-phase round ladder; same records, simpler bounds).
5. **Whole-read chain walk** — pointer-doubling over the site-successor
   graph from read heads.  v2's mid-read resync boundaries (and their
   runtime crossing guard) are gone: log2(NS) doubling rounds cover any
   chain length, so boundaries bought nothing but three dense
   cumulative ops and a soundness edge.
6. **Splice** — segment ids via one scatter+cummax (phase-encoded
   record marks), then two flat gathers (per-segment struct, source
   codes) + one for long emits.

Reference semantics: the scan machine of src/correct/mod.rs:53-107 with
the strategy ladder of src/correct/ (see br_tpu.correct.reference for
the full restatement).  Every engineered bound raises a per-read ``cap``
flag; capped reads are re-corrected exactly on the host (native C++
engine), so output is always bit-exact vs the reference semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct import device_codec as dc

I32 = jnp.int32
U32 = jnp.uint32
I8 = jnp.int8

#: de Bruijn walk cap (engine.py MAX_WALK parity).
WALK_MAX = 248
#: 2-bit bases per u32 emit word.
BPW = 16
#: emit words per record: WALK_MAX+1 bases.
EW = (WALK_MAX + 1 + BPW - 1) // BPW
#: tier-1 walk ring (full history; see engine2 T1_STEPS discussion).
RING = 32
T1_STEPS = 30
#: tier-2 walk history width (start + up to WALK_MAX visited k-mers).
NH2 = 256
#: chain records per site (applied repairs in one dirty chain).
SLOTS = 8
#: site-block width for the adaptive attempt loops.
BLK = 4096

BIG = np.int32(1 << 30)
NEG_INF = np.int32(-(1 << 20))

# traceback layer codes (greedy DP)
OP_MATCH, OP_SUBST, OP_DEL, OP_INS, TB_START = 0, 1, 2, 3, 4

RUN, ACCEPT, DECLINE, CAP = 0, 1, 2, 3


def _u(x):
    return jnp.uint32(x)


def _mask(k: int):
    return jnp.uint32((1 << (2 * k)) - 1)


def add_nuc32(kmer, code, k: int):
    """Rolling k-mer update in uint32 (2k <= 32)."""
    return ((kmer << _u(2)) & _mask(k)) ^ code.astype(U32)


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
    cum = jnp.cumsum(mask.astype(I32))
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


class AttemptOut3(tuple):
    """(ok, new_kmer u32, consumed i32, emit (N, nw) u32, cnt i32, cap)"""

    __slots__ = ()

    def __new__(cls, ok, new_kmer, consumed, emit, cnt, cap):
        return tuple.__new__(cls, (ok, new_kmer, consumed, emit, cnt, cap))

    ok = property(lambda s: s[0])
    new_kmer = property(lambda s: s[1])
    consumed = property(lambda s: s[2])
    emit = property(lambda s: s[3])
    cnt = property(lambda s: s[4])
    cap = property(lambda s: s[5])


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
    n = jnp.sum(ok.astype(I32))
    alt = jnp.sum(jnp.arange(4, dtype=U32) * ok.astype(U32))
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
        nk = jnp.sum(keep.astype(I32))
        keep2 = keep & one_more
        nk2 = jnp.sum(keep2.astype(I32))

        sel = jnp.where(nk == 1, keep, keep2)
        ok = (nalts == 1) & ((nk == 1) | ((nk > 1) & (nk2 == 1)))
        offset = jnp.sum(jnp.arange(3, dtype=I32) * sel.astype(I32))

        emit = jnp.zeros(1, dtype=U32).at[0].set(corr & _u(3))
        return AttemptOut3(ok, corr, offset, emit, jnp.int32(1),
                           jnp.bool_(False))

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
            n = jnp.sum(okv.astype(I32))
            alt = jnp.sum(jnp.arange(4, dtype=U32) * okv.astype(U32))
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
        emit_words, emit_cnts, new_kmers, offs_c = [], [], [], []
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
                ew = ew | (b << _u(2 * t))
            emit_words.append(ew)
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
        nk1 = jnp.sum(keep.astype(I32))
        keep2 = keep & one_more
        nk2 = jnp.sum(keep2.astype(I32))
        sel = jnp.where(nk1 == 1, keep, keep2)
        ok = (nalts == 1) & ((nk1 == 1) | ((nk1 > 1) & (nk2 == 1)))

        selI = sel.astype(I32)
        selU = sel.astype(U32)
        consumed = jnp.sum(jnp.array(offs_c, dtype=I32) * selI)
        cnt = jnp.sum(jnp.array(emit_cnts, dtype=I32) * selI)
        emit0 = jnp.sum(jnp.stack(emit_words) * selU)
        new_kmer = jnp.sum(jnp.stack(new_kmers) * selU)

        emit = jnp.zeros(1, dtype=U32).at[0].set(emit0)
        return AttemptOut3(ok, new_kmer, consumed, emit, cnt,
                           jnp.bool_(False))

    return attempt


def make_greedy_attempt32(probe, codes, k: int, ms: int, nb: int):
    """Greedy strategy (greedy.rs:129-173): engine.make_greedy_attempt in
    uint32, code-domain alignment (the driver routes non-pure-ACGT reads
    to the host oracle, where the byte domain matters)."""
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
            ns = jnp.sum(okv.astype(I32))
            sa = jnp.sum(jnp.arange(4, dtype=U32) * okv.astype(U32))
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

            tb_s = tb_s.at[d].set(sb_d)
            tb_i = tb_i.at[d].set(ib_d)
            tb_d = tb_d.at[d].set(db_d)
            return (S_d, I_d, D_d, sb_d, Sp, tb_s, tb_i, tb_d)

        neg = jnp.full(W, NEG_INF, dtype=I32)
        tb0 = jnp.zeros((ND, W), dtype=jnp.int8)
        carry = (neg, neg, neg, jnp.zeros(W, jnp.int8), neg, tb0, tb0, tb0)
        carry = jax.lax.fori_loop(0, ND, diag_step, carry)
        tb_s, tb_i, tb_d = carry[5], carry[6], carry[7]

        its = jnp.arange(ms, dtype=I32)
        mr = (k - 1) + its
        mc = (k - 1) + its + 2

        def tb_at(mat, r, j):
            d = jnp.clip(r + j, 0, ND - 1)
            return mat[d, jnp.clip(r, 0, Lr)]

        ops_rev0 = jnp.full((ms, T), jnp.int8(TB_START))

        def tb_step(t, st):
            r, j, layer, nops, ops_rev = st
            active = layer != TB_START
            is_ins = layer == OP_INS
            is_del = layer == OP_DEL
            ops_rev = ops_rev.at[:, t].set(
                jnp.where(active, layer, jnp.int8(TB_START)))
            nxt = jnp.where(
                is_ins, tb_at(tb_i, r, j),
                jnp.where(is_del, tb_at(tb_d, r, j),
                          tb_at(tb_s, r - 1, j - 1)))
            r2 = jnp.where(active, jnp.where(is_del, r, r - 1), r)
            j2 = jnp.where(active, jnp.where(is_ins, j, j - 1), j)
            layer2 = jnp.where(active, nxt, layer)
            nops2 = nops + active.astype(I32)
            return (r2, j2, layer2, nops2, ops_rev)

        layer0 = tb_at(tb_s, mr, mc)
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
        offset = jnp.sum(contrib * ((w >= bl) & (w < first_w[:, None])), 1)
        rev_ind = (ops_rev == OP_INS) | (ops_rev == OP_DEL)
        rev_in = jnp.arange(T)[None, :] < nops[:, None]
        pref_ind = jnp.cumprod(
            rev_ind | ~rev_in, axis=1).astype(bool) & rev_in
        rev_contrib = jnp.where(ops_rev == OP_INS, 1,
                                jnp.where(ops_rev == OP_DEL, -1, 0))
        offset_corr = jnp.sum(rev_contrib * pref_ind, axis=1)
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

        it_sel = jnp.sum(its * sel.astype(I32))
        cnt = it_sel + 2
        offs = jnp.sum(off_align * sel.astype(I32))
        raw_consumed = cnt + offs
        consumed = jnp.maximum(raw_consumed, 0)
        cap = ok & (raw_consumed < 0)

        new_kmer = jnp.zeros((), U32)
        for it in range(ms):
            new_kmer = jnp.where(sel[it], wks[it + 1], new_kmer)

        emit = jnp.zeros((), dtype=U32)
        for t in range(ms + 1):
            emit = emit | jnp.where(t < cnt, path[t].astype(U32) << _u(2 * t),
                                    _u(0))
        return AttemptOut3(ok, new_kmer, consumed,
                           jnp.zeros(1, U32).at[0].set(emit), cnt, cap)

    return attempt
