"""The v2 TPU correction engine: site-parallel, loop-minimal.

Redesign of br_tpu.correct.engine driven by the measured cost model
(PERF_NOTES.md): random gathers run at ~130 M elems/s, while_loop
iterations cost ~12.5 us each, so the v1 design (one serial while_loop
iteration per repair attempt, thousands per long read) is latency-bound.

v2 structure per pass (one strategy, one direction, (B, L) bucket,
ONE jitted program):

1. **Dense precompute** — codes, rolling k-mers, validity bitmap V
   (one bitfield gather per position), next-transition jump table,
   valid-run lengths.
2. **Site compaction** — attempt sites are the valid->invalid edges
   ``V[p-1] & ~V[p]`` (~2% of positions); compacted with
   cumsum + branchless binary search (no scatter).
3. **Site-parallel attempts** — every site's repair attempt is evaluated
   in parallel (the strategy scenario tables are straight-line vector
   code; the de Bruijn walks are while_loops whose trip count is the max
   *walk length*, not the site count).
4. **Dirty-window simulation** — after an applied repair the register
   differs from the table for at most k absorbs; the window is simulated
   with k unrolled probe steps.  A new valid->invalid event inside the
   window needs an attempt with the *dirty* register: those become
   pending sites resolved in geometrically-shrinking extra rounds.
5. **Segment-parallel chain walk** — reads are cut at guaranteed-resync
   boundaries (the machine provably passes such points in the pure
   state: a point >= OFFSET = k+16 deep inside a valid run, guarded at
   runtime by the dirty-window-crossing check).  Which sites the scan
   actually visits is then computed per *segment* (mean ~200 bases,
   ~4 sites) by a tiny while_loop, instead of per read (~2000 sites).
6. **Splice** — visited applied records are compacted and the output is
   assembled with boundary scatter + cumsum + one gather.

Every engineered bound (site/pending/record/walk capacity, 62-base walk
cap, boundary-crossing guard) raises a per-read ``cap`` flag; capped
reads are re-corrected exactly by the host oracle (native C++ engine),
so results are always bit-exact vs the reference semantics
(/root/reference/src/correct/mod.rs:53-107 scan machine; see
br_tpu.correct.reference for the full semantics restatement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct import device_codec as dc
from br_tpu.correct.device_codec import U64, _u, add_nuc
from br_tpu.correct.engine import (
    AttemptOut,
    TpuCorrector,
    _code_at,
    make_greedy_attempt,
    make_one_attempt,
    make_two_attempt,
)

I32 = jnp.int32

#: de Bruijn walk cap: emitted path must fit W u64 words (31 bases each);
#: matches v1's MAX_WALK (engine.py) so fallback rates stay low.
WALK_MAX = 248
W = 8
#: loop-guard ring size (see engine.py RING discussion).
RING = 32
#: resync-boundary depth inside a valid run.  Any repair activity that
#: would cross a boundary raises cap (run-time guard), so this only
#: tunes how often that happens, not correctness.
OFF_MARGIN = 16
#: chain records per site (applied repairs in one dirty chain).
SLOTS = 8
TAIL_ROUNDS = 16
#: tier-1 walk step budget: <= RING-2 steps, so the tier-1 ring holds the
#: FULL visited history (exact revisit detection, graph.rs:71-75 /
#: gap_size.rs:54) — no wrap, no missed long cycles.
T1_STEPS = 30
#: tier-2 history width (start + up to WALK_MAX visited k-mers).
NH2 = 256

BIG = np.int32(1 << 30)


def _rcummin(a):
    return jnp.flip(jax.lax.cummin(jnp.flip(a, -1), axis=a.ndim - 1), -1)


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
    ORIGINAL axis marking entries that did not fit[, source indices])."""
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


def _pack_words(codes_list):
    """Pack a python list of 2-bit code scalars into W u64 words."""
    words = [jnp.zeros((), U64) for _ in range(W)]
    for t, c in enumerate(codes_list):
        wi, sh = divmod(t, 31)
        words[wi] = words[wi] | (c.astype(U64) << _u(2 * sh))
    return jnp.stack(words)


# ---------------------------------------------------------------------------
# Unique-successor de Bruijn walk, array-level and two-tier.
#
# Tier 1 walks every enabled lane up to T1_STEPS with the visited history
# held in a RING-wide buffer (T1_STEPS <= RING-2, so the history is FULL:
# the revisit test is exactly the reference's viewed-kmer set,
# graph.rs:71-75 / gap_size.rs:54).  The few lanes still running are
# compacted to `n2` slots and continue in tier 2 up to WALK_MAX steps with
# an NH2-wide (full) history.  Lanes that outgrow n2 or WALK_MAX raise CAP
# (-> exact host fallback).
# ---------------------------------------------------------------------------

RUN, ACCEPT, DECLINE, CAP = 0, 1, 2, 3


def _alt_info_arr(probe, kmer):
    """Array-level 'exactly one alternative last base' gate
    (mod.rs:114-116); kmer is a (N,) u64 array."""
    base = (kmer >> _u(2)) << _u(2)
    cands = base[None, :] ^ jnp.arange(4, dtype=U64)[:, None]
    ok = probe(cands)
    n = jnp.sum(ok.astype(I32), axis=0)
    alt = jnp.sum(jnp.arange(4, dtype=U64)[:, None] * ok.astype(U64),
                  axis=0)
    return n, base ^ alt


def _walk_active(wk, n, status, use_fc, max_steps, phase_cap: int):
    return (status == RUN) & (use_fc | ((n - 1) < max_steps)) & \
        (n <= phase_cap)


def _walk_phase(probe, k: int, state, use_fc, max_steps, first_correct,
                phase_cap: int, nh: int):
    """Advance the walk until every lane freezes (array-level while_loop).

    state = (wk, n, buf, status, hist); hist[:, j] = register after step j
    (slot 0 = start k-mer), so `revisit` is exact.  ``use_fc`` per-lane
    selects graph mode (accept on reaching ``first_correct``) vs fill mode
    (walk exactly ``max_steps``; budget-exhausted lanes freeze as RUN =
    fill success).  CAP outranks ACCEPT at the WALK_MAX step."""
    wcols = jnp.arange(W, dtype=I32)[None, :]
    hcols = jnp.arange(nh, dtype=I32)[None, :]

    def cond(st):
        wk, n, buf, status, hist = st
        return jnp.any(_walk_active(wk, n, status, use_fc, max_steps,
                                    phase_cap))

    def body(st):
        wk, n, buf, status, hist = st
        act = _walk_active(wk, n, status, use_fc, max_steps, phase_cap)
        cands = jnp.stack([add_nuc(wk, jnp.uint8(a), k) for a in range(4)])
        okv = probe(cands)
        ns = jnp.sum(okv.astype(I32), axis=0)
        sa = jnp.sum(jnp.arange(4, dtype=U64)[:, None] * okv.astype(U64),
                     axis=0)
        wk2 = add_nuc(wk, sa.astype(jnp.uint8), k)
        branch_fail = ns != 1
        revisit = jnp.any(hist == wk2[:, None], axis=1)
        accept = use_fc & (wk2 == first_correct)
        capped = n >= WALK_MAX

        wi = n // 31
        sh = ((n % 31) * 2).astype(U64)
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


def _tiered_walk(probe, k: int, corr, alt_code, first_correct, use_fc,
                 max_steps, enabled, n2: int):
    """Full walk over N lanes: tier 1 (all lanes, <= T1_STEPS) then tier 2
    (<= n2 surviving lanes, <= WALK_MAX).  Returns (ok, cap, buf, n, wk)."""
    N = corr.shape[0]
    buf0 = jnp.zeros((N, W), U64).at[:, 0].set(alt_code.astype(U64))
    hist0 = jnp.full((N, RING), ~_u(0)).at[:, 0].set(corr)
    status0 = jnp.where(enabled, RUN, DECLINE).astype(I32)
    st = (corr, jnp.ones(N, I32), buf0, status0, hist0)
    wk, n, buf, status, hist = _walk_phase(
        probe, k, st, use_fc, max_steps, first_correct, T1_STEPS, RING)

    pend = _walk_active(wk, n, status, use_fc, max_steps, WALK_MAX)
    (c_wk, c_n, c_buf, c_hist, c_fc, c_ufc, c_ms, c_src), c_ok, over, _ = \
        _compact(pend, (wk, n, buf, hist, first_correct, use_fc, max_steps,
                        jnp.arange(N, dtype=I32)), n2, with_src=True)
    status = jnp.where(over, CAP, status)

    hist2 = jnp.full((n2, NH2), ~_u(0)).at[:, :RING].set(c_hist)
    st2 = (c_wk, c_n, c_buf,
           jnp.where(c_ok, RUN, DECLINE).astype(I32), hist2)
    wk2, n2a, buf2, status2, _h = _walk_phase(
        probe, k, st2, c_ufc, c_ms, c_fc, WALK_MAX, NH2)

    idx = jnp.where(c_ok, c_src, N)  # OOB rows dropped by scatter
    wk = wk.at[idx].set(wk2, mode="drop")
    n = n.at[idx].set(n2a, mode="drop")
    buf = buf.at[idx].set(buf2, mode="drop")
    status = status.at[idx].set(status2, mode="drop")

    ok = jnp.where(use_fc, status == ACCEPT, status == RUN)
    return ok, status == CAP, buf, n, wk


# ---------------------------------------------------------------------------
# Graph / GapSize attempts (array-level), parameterized by the error_len
# implementation (pure sites use the O(1) jump table; dirty ones absorb at
# most k explicit steps and then use the same jump table — see
# make_pass2_fn.dirty_err_fn).
# ---------------------------------------------------------------------------


def make_graph_attempt_arr(probe, codes, k: int, err_fn, n2: int):
    """Graph strategy (graph.rs:44-85) over arrays of sites."""

    def attempt(i, kmer, length):
        err_len, fc, ecap = err_fn(i, kmer, length)
        nalts, corr = _alt_info_arr(probe, kmer)
        alt_code = corr & _u(3)
        ok_w, cap, buf, n, wk = _tiered_walk(
            probe, k, corr, alt_code, fc,
            jnp.ones(i.shape, bool), jnp.full(i.shape, WALK_MAX, I32),
            nalts == 1, n2)
        ok = (nalts == 1) & ok_w
        return AttemptOut(ok, wk, err_len + 1, buf, n,
                          ((nalts == 1) & cap) | ecap)

    return attempt


def make_gap_attempt_arr(probe, codes, k: int, c: int, err_fn, n2: int):
    """GapSize dispatch (gap_size.rs:97-108) over arrays of sites."""

    def attempt(i, kmer, length):
        err_len, fc, ecap = err_fn(i, kmer, length)
        nalts, corr = _alt_info_arr(probe, kmer)
        alt_code = corr & _u(3)

        is_graph = err_len < k
        gap = jnp.maximum(err_len - k, 0)
        is_one = err_len == k
        is_fill = err_len > k
        # one walk serves both graph mode and fill mode (per-lane select)
        ok_w, cap_w, buf, n, wk = _tiered_walk(
            probe, k, corr, alt_code, fc, is_graph, gap,
            (is_graph | is_fill) & (nalts == 1), n2)
        one_v = jax.vmap(
            lambda ii, km, ln: make_one_attempt(probe, codes, ln, k, c)(
                ii, km))
        o = one_v(i, kmer, length)

        ok = jnp.where(is_one, o.ok, (nalts == 1) & ok_w)
        cap_hit = ~is_one & (nalts == 1) & cap_w
        new_kmer = jnp.where(is_one, o.new_kmer, wk)
        consumed = jnp.where(is_graph, err_len + 1,
                             jnp.where(is_one, o.consumed, n))
        cnt = jnp.where(is_one, o.cnt, n)
        emitz = jnp.zeros_like(buf).at[:, 0].set(o.emit[:, 0])
        emit = jnp.where(is_one[:, None], emitz, buf)
        return AttemptOut(ok, new_kmer, consumed, emit, cnt,
                          cap_hit | ecap)

    return attempt


# ---------------------------------------------------------------------------
# The pass builder.
# ---------------------------------------------------------------------------


def make_pass2_fn(k: int, strategy: str, c: int, ms: int, nb: int,
                  B: int, L: int, probe_kind: str, _stage: int = 0):
    """One jitted (table, packed (B,L//4) u8, lens (B,) i32) ->
    (out packed (B,L//4) u8, out_lens (B,) i32, cap (B,) bool,
    aux (8,) i32).  Reads travel as 2-bit codes, 4 per byte LSB-first
    (4x less relay transfer than ascii; the driver guarantees pure
    uppercase-ACGT input so codes are lossless).
    aux = (sites, cap-overflow, cap-attempt, cap-boundary, cap-rounds,
    visited sites, applied records, capped lanes) diagnostic counters.

    ``_stage`` (profiling only): stop the program after stage N and return
    checksums of the live intermediates instead (0 = full pass)."""

    BL = B * L
    OFFSET = k + OFF_MARGIN
    # sized ~1.5x over the worst observed corpus chunk (sites <= 0.55% of
    # positions after gating on real long-read data); overflow -> cap ->
    # exact host fallback, so tight capacities trade rare fallbacks for
    # throughput on every pass.
    NS = max(512, BL // 64)          # site capacity
    # gate-surviving sites (full attempt evaluation).  one/two attempts
    # are straight-line and cheap, so they keep the full site capacity
    # (the first fwd pass of a chain sees the most sites — r1 profiling
    # measured 17k gate survivors on a 2M-element chunk, overflowing the
    # old NS//2).  Walk strategies pay ~4 probes x NSB per walk step, so
    # they run tighter and spill overflow to the host fallback.
    if strategy in ("one", "two"):
        NSB = NS
    else:
        NSB = max(1024, NS // 4)
    N1 = max(512, NS // 8)           # dirty-round-1 lane capacity
    NTAIL = max(256, NS // 16)       # tail-round lane capacity
    NW2 = 1024                       # tier-2 walk lanes (round 0)
    NW2D = 256                       # tier-2 walk lanes (dirty rounds)
    NR = NS + NS // 2                # record capacity
    NSEG = B + max(256, BL // 96)    # walk-lane capacity
    # pointer-doubling rounds: after r rounds visited covers 2^r hops from
    # a segment head; chains are strictly increasing in site index, hence
    # <= NS long, so ceil(log2(NS+1)) rounds always suffice.
    REACH_ROUNDS = NS.bit_length()
    DONE_PURE, DONE_END, PENDING = 0, 1, 2

    def passfn(table, packed_in, lens):
        # dtype-polymorphic membership probe: dense arrays use the
        # narrowest k-mer dtype (u32 for k <= 16), site/walk math is u64
        if probe_kind == "solid":
            probe = dc.make_solid_probe_any(table, k)
        else:
            probe = dc.make_hash_probe_any(table, k)

        # ---------------- 1. dense precompute --------------------------
        codes2 = dc.unpack_codes(packed_in, L)          # (B, L) 2-bit
        if dc.kmer_dtype(k) == dc.U32:
            kmers2 = dc.rolling_kmers32(codes2, k)      # (B, L)
        else:
            kmers2 = dc.rolling_kmers(codes2, k)
        pos = jnp.arange(L, dtype=I32)[None, :]
        lensb = lens[:, None]
        V2 = probe(kmers2) & (pos >= k - 1) & (pos < lensb)
        Vprev = jnp.pad(V2[:, :-1], ((0, 0), (1, 0)))
        T2 = Vprev & ~V2 & (pos >= k) & (pos < lensb)

        if _stage == 1:  # dense precompute (codes, kmers, V, T)
            return (jnp.sum(V2.astype(I32)), jnp.sum(T2.astype(I32)))

        ntp = _rcummin(jnp.where(T2, pos, BIG))          # next transition >= p
        nvp = _rcummin(jnp.where(V2, pos, BIG))          # next valid >= p
        lastinv = jax.lax.cummax(jnp.where(~V2, pos, -1), axis=1)
        runlen = pos - lastinv
        Bm2 = (runlen == OFFSET) & (pos < lensb)         # boundary at m=p+1
        nbp = _rcummin(jnp.where(Bm2, pos, BIG))         # next boundary pos

        rowbase = (jnp.arange(B, dtype=I32) * L)[:, None]
        nt = jnp.where(ntp < BIG, ntp + rowbase, BIG).reshape(-1)
        nv = jnp.where(nvp < BIG, nvp + rowbase, BIG).reshape(-1)
        se2 = jnp.minimum(jnp.where(nbp < BIG, nbp + 1, BIG),
                          lensb) + rowbase               # segment end (flat)
        se = se2.reshape(-1)
        codes = codes2.reshape(-1)
        kmers = kmers2.reshape(-1)

        if _stage == 2:  # + jump tables / segment ends
            return (jnp.sum(nt), jnp.sum(nv), jnp.sum(se),
                    jnp.sum(Bm2.astype(I32)))

        cap_lane = jnp.zeros(B, dtype=bool)

        def flag_lane(cap_lane, lane_idx, flags):
            return cap_lane.at[jnp.clip(lane_idx, 0, B - 1)].max(
                flags & (lane_idx >= 0) & (lane_idx < B))

        # ---------------- 2. site compaction ---------------------------
        Tf = T2.reshape(-1)
        cumT = jnp.cumsum(Tf.astype(I32))
        n_sites = cumT[-1]
        sflat = jnp.clip(
            _lower_bound(cumT, jnp.arange(1, NS + 1, dtype=I32)), 0, BL - 1)
        smask = jnp.arange(NS, dtype=I32) < jnp.minimum(n_sites, NS)
        # lanes whose sites were dropped by the NS cap
        cum_rs = cumT[jnp.clip(rowbase[:, 0] - 1, 0, BL - 1)]
        cum_rs = jnp.where(rowbase[:, 0] > 0, cum_rs, 0)
        cum_re = cumT[rowbase[:, 0] + (L - 1)]
        cap_lane = cap_lane | (cum_re > jnp.maximum(cum_rs, NS))

        s_lane = sflat // L
        s_len = s_lane * L + lens[jnp.clip(s_lane, 0, B - 1)]  # flat length
        s_se = se[sflat]
        s_reg = kmers[sflat].astype(U64)
        s_pos = jnp.where(smask, sflat, BIG)

        if _stage == 3:  # + site compaction
            return (jnp.sum(s_pos), jnp.sum(s_reg), jnp.sum(s_se),
                    jnp.sum(cap_lane.astype(I32)))

        # ---------------- 3. attempt machinery -------------------------
        def pure_err_fn(i, kmer, length):
            """error_len via the jump table — valid only when the register
            equals the table k-mer at i (pure state)."""
            rem = length - i
            q = nv[jnp.clip(i + 1, 0, BL - 1)]
            found = (q < length) & (q - i <= rem - 1) & (i + 1 < BL)
            j = jnp.where(found, q - i, rem)
            end_idx = jnp.where(found, q,
                                jnp.where(rem >= 2, i + rem - 1, i))
            km_end = kmers[jnp.clip(end_idx, 0, BL - 1)].astype(U64)
            return j, km_end, jnp.bool_(False)

        def dirty_err_fn(i, kmer, length):
            """Exact error_len (mod.rs:130-152) for a dirty register in
            O(k): absorb at most k explicit steps (after k absorbs the
            register provably equals the rolling table k-mer), then jump
            to the next valid position via the nv table."""
            rem = length - i
            km = kmer
            j = jnp.zeros_like(i)
            done = jnp.zeros(i.shape, bool)
            for j2 in range(1, k + 1):
                at_end = jnp.int32(j2) >= rem
                step = ~done
                adv = step & ~at_end
                km2 = jnp.where(
                    adv,
                    add_nuc(km, _code_at(codes, jnp.clip(i + j2, 0, BL - 1)),
                            k), km)
                f = adv & probe(km2)
                j = jnp.where(step, jnp.int32(j2), j)
                km = km2
                done = done | (step & (at_end | f))
            q = nv[jnp.clip(i + k + 1, 0, BL - 1)]
            okq = (i + k + 1 < BL) & (q < length)
            j_jump = jnp.where(okq, q - i, rem)
            end_idx = jnp.where(okq, q,
                                jnp.where(rem >= 2, i + rem - 1, i))
            km_jump = kmers[jnp.clip(end_idx, 0, BL - 1)].astype(U64)
            j = jnp.where(done, j, j_jump)
            km = jnp.where(done, km, km_jump)
            return j, km, jnp.zeros(i.shape, bool)

        def build_attempt(err_fn, n2: int):
            if strategy == "one":
                def att(i, kmer, length):
                    return make_one_attempt(probe, codes, length, k, c)(
                        i, kmer)
            elif strategy == "two":
                def att(i, kmer, length):
                    return make_two_attempt(probe, codes, length, k, c)(
                        i, kmer)
            elif strategy == "greedy":
                # code-domain alignment: exact for pure uppercase-ACGT
                # reads, which the driver guarantees (impure reads are
                # routed to the host oracle before dispatch)
                def att(i, kmer, length):
                    return make_greedy_attempt(
                        probe, codes, length, k, ms, nb,
                        ascii_arr=None)(i, kmer)
            elif strategy == "graph":
                return make_graph_attempt_arr(probe, codes, k, err_fn, n2)
            elif strategy == "gap-size":
                return make_gap_attempt_arr(probe, codes, k, c, err_fn, n2)
            else:
                raise ValueError(strategy)
            return jax.vmap(att)

        attempt_pure = build_attempt(pure_err_fn, NW2)
        attempt_dirty = build_attempt(dirty_err_fn, NW2D)

        # ---------------- 4. dirty-window simulation -------------------
        def dirty_sim(i0, reg0, prev0, t0, lenf, sef):
            """Absorb until k steps since the last applied repair.

            Returns (state, i_out, reg_out, t_out, cap_cross) where state
            is DONE_PURE / DONE_END / PENDING; for PENDING (i_out, reg_out,
            t_out) is the nested attempt site."""
            i, reg, prev, t = i0, reg0, prev0, t0
            state = jnp.full(jnp.shape(i0), -1, dtype=I32)  # -1 = running
            for _ in range(k):
                running = state < 0
                step_on = running & (t < k)
                state = jnp.where(running & ~step_on, DONE_PURE, state)
                end_read = i >= lenf
                state = jnp.where(step_on & end_read, DONE_END, state)
                act = step_on & ~end_read
                reg_n = add_nuc(reg, _code_at(codes, i), k)
                v = probe(reg_n)
                nested = act & ~v & prev
                state = jnp.where(nested, PENDING, state)
                adv = act & ~nested
                reg = jnp.where(act, reg_n, reg)
                prev = jnp.where(adv, v, prev)
                i = jnp.where(adv, i + 1, i)
                t = jnp.where(adv, t + 1, t)
            state = jnp.where(state < 0, DONE_PURE, state)
            # PENDING: attempt at i with register reg, t absorbs so far
            t = jnp.where(state == PENDING, t + 1, t)
            # Crossing a resync boundary always raises cap — including in
            # the DONE_END state: when a later boundary exists (sef < lenf)
            # the next segment's walk lane still assumes a pure machine at
            # that boundary, so an uncapped crossing could splice repairs
            # the oracle never made.  For the common last-segment case
            # sef == lenf and i <= lenf, so this never fires spuriously.
            cap_cross = i > sef
            return state, i, reg, t, cap_cross

        # per-site resolution state
        succ_pos = jnp.full(NS, BIG, dtype=I32)
        # cap reason per site: 0 none, 1 capacity overflow,
        # 2 attempt cap, 3 boundary crossing, 4 rounds exhausted
        s_cap = jnp.zeros(NS, dtype=I32)
        # records
        r_pos = jnp.full((NS, SLOTS), BIG, dtype=I32)
        r_cnt = jnp.zeros((NS, SLOTS), dtype=I32)
        r_skip = jnp.zeros((NS, SLOTS), dtype=I32)
        r_emit = jnp.zeros((NS, SLOTS, W), dtype=U64)

        def process_round(ids, i_arr, reg_arr, t_arr, slot_arr, act,
                          lenf, sef, pure_round,
                          succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
                          n_lanes):
            """Evaluate attempts + continue the sim for `n_lanes` sites.

            Returns updated result arrays plus the pending set."""
            # gate: exactly-one-alternative (shared by every strategy)
            base = (reg_arr >> _u(2)) << _u(2)
            cands = base[None, :] ^ jnp.arange(4, dtype=U64)[:, None]
            nalts = jnp.sum(probe(cands).astype(I32), axis=0)
            gate = act & (nalts == 1)

            (g_ids, g_i, g_reg, g_t, g_slot, g_lenf, g_sef), g_ok, g_over = \
                _compact(gate, (ids, i_arr, reg_arr, t_arr, slot_arr,
                                lenf, sef), NSB if n_lanes == NS else n_lanes)
            s_cap = s_cap.at[jnp.clip(ids, 0, NS - 1)].max(
                jnp.where(g_over & (ids < NS), 1, 0))

            att_fn = attempt_pure if pure_round else attempt_dirty
            res = att_fn(g_i, g_reg, g_lenf)
            emit_w = res.emit
            if emit_w.shape[-1] < W:
                emit_w = jnp.pad(
                    emit_w, ((0, 0), (0, W - emit_w.shape[-1])))
            applied = g_ok & res.ok & ~res.cap
            att_cap = g_ok & res.cap

            # write records
            widx = jnp.clip(g_ids, 0, NS - 1) * SLOTS + jnp.clip(
                g_slot, 0, SLOTS - 1)
            wvalid = applied & (g_slot < SLOTS)
            slot_over = applied & (g_slot >= SLOTS)
            rp = r_pos.reshape(-1)
            rc = r_cnt.reshape(-1)
            rs = r_skip.reshape(-1)
            re = r_emit.reshape(-1, W)
            rp = rp.at[widx].min(jnp.where(wvalid, g_i, BIG))
            rc = rc.at[widx].max(jnp.where(wvalid, res.cnt.astype(I32), 0))
            rs = rs.at[widx].max(jnp.where(wvalid,
                                           res.consumed.astype(I32), 0))
            re = re.at[widx].max(
                jnp.where(wvalid[:, None], emit_w, _u(0)))
            r_pos = rp.reshape(NS, SLOTS)
            r_cnt = rc.reshape(NS, SLOTS)
            r_skip = rs.reshape(NS, SLOTS)
            r_emit = re.reshape(NS, SLOTS, W)

            # applied -> dirty sim from (i + consumed)
            sim_i0 = g_i + res.consumed.astype(I32)
            st_a, ia, rga, ta, capx_a = dirty_sim(
                sim_i0, res.new_kmer, jnp.ones_like(applied),
                jnp.zeros_like(g_t), g_lenf, g_sef)

            # failed:
            if pure_round:
                # pure failure: machine stays pure; next site = nt[i+1]
                st_f = jnp.where(g_i + 1 >= g_lenf, DONE_END, DONE_PURE)
                i_f = g_i + 1
                rg_f = g_reg
                t_f = g_t
                capx_f = jnp.zeros_like(applied)
            else:
                st_f, i_f, rg_f, t_f, capx_f = dirty_sim(
                    g_i + 1, g_reg, jnp.zeros_like(applied), g_t,
                    g_lenf, g_sef)

            st = jnp.where(applied, st_a, st_f)
            i_n = jnp.where(applied, ia, i_f)
            rg_n = jnp.where(applied, rga, rg_f)
            t_n = jnp.where(applied, ta, t_f)
            capx = jnp.where(applied, capx_a, capx_f)
            slot_n = g_slot + applied.astype(I32)

            live = g_ok & ~att_cap & ~slot_over
            done_pure = live & (st == DONE_PURE) & ~capx
            done_end = live & (st == DONE_END)
            pend = live & (st == PENDING) & ~capx
            capped = g_ok & (att_cap | slot_over | capx)

            # record resolution
            idc = jnp.clip(g_ids, 0, NS - 1)
            sp = jnp.where(done_pure,
                           nt[jnp.clip(i_n, 0, BL - 1)], BIG)
            sp = jnp.where(done_pure & (i_n < BL), sp, BIG)
            succ_pos = succ_pos.at[idc].min(
                jnp.where(done_pure, sp, BIG))
            cap_code = jnp.maximum(
                jnp.where(att_cap, 2, 0),
                jnp.maximum(jnp.where(slot_over, 1, 0),
                            jnp.where(capx & g_ok, 3, 0)))
            s_cap = s_cap.at[idc].max(jnp.where(g_ok, cap_code, 0))

            # gate-failed (nalts != 1) sites are failures too
            gf = act & (nalts != 1)
            if pure_round:
                gf_sp = jnp.where(i_arr + 1 < lenf,
                                  nt[jnp.clip(i_arr + 1, 0, BL - 1)], BIG)
                succ_pos = succ_pos.at[jnp.clip(ids, 0, NS - 1)].min(
                    jnp.where(gf, gf_sp, BIG))
                gf_pend = jnp.zeros_like(gf)
                gf_i = i_arr
                gf_reg = reg_arr
                gf_t = t_arr
            else:
                st_g, i_g, rg_g, t_g, capx_g = dirty_sim(
                    i_arr + 1, reg_arr, jnp.zeros_like(gf), t_arr,
                    lenf, sef)
                gf_dp = gf & (st_g == DONE_PURE) & ~capx_g
                gsp = jnp.where(gf_dp & (i_g < BL),
                                nt[jnp.clip(i_g, 0, BL - 1)], BIG)
                succ_pos = succ_pos.at[jnp.clip(ids, 0, NS - 1)].min(
                    jnp.where(gf_dp, gsp, BIG))
                s_cap = s_cap.at[jnp.clip(ids, 0, NS - 1)].max(
                    jnp.where(gf & capx_g, 3, 0))
                gf_pend = gf & (st_g == PENDING) & ~capx_g
                gf_i = i_g
                gf_reg = rg_g
                gf_t = t_g

            # pending sets (two sources: post-attempt, gate-failed dirty)
            pend_ids = jnp.concatenate([g_ids, ids])
            pend_i = jnp.concatenate([i_n, gf_i])
            pend_reg = jnp.concatenate([rg_n, gf_reg])
            pend_t = jnp.concatenate([t_n, gf_t])
            pend_slot = jnp.concatenate([slot_n, slot_arr])
            pend_lenf = jnp.concatenate([g_lenf, lenf])
            pend_sef = jnp.concatenate([g_sef, sef])
            pend_mask = jnp.concatenate([pend, gf_pend])
            return (succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
                    pend_mask, pend_ids, pend_i, pend_reg, pend_t,
                    pend_slot, pend_lenf, pend_sef)

        # ---- round 0 (pure) -------------------------------------------
        ids0 = jnp.arange(NS, dtype=I32)
        (succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
         pm, pids, pi, preg, pt, pslot, plenf, psef) = process_round(
            ids0, jnp.where(smask, sflat, 0), s_reg,
            jnp.full(NS, k, I32), jnp.zeros(NS, I32), smask,
            s_len, s_se, True,
            succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit, NS)

        if _stage == 4:  # + round 0 (pure attempts + dirty sim)
            return (jnp.sum(succ_pos), jnp.sum(s_cap), jnp.sum(r_pos),
                    jnp.sum(pm.astype(I32)))

        # ---- dirty round 1 --------------------------------------------
        (cf, ok_m, over) = _compact(
            pm, (pids, pi, preg, pt, pslot, plenf, psef), N1)
        s_cap = s_cap.at[jnp.clip(pids, 0, NS - 1)].max(
            jnp.where(over & (pids < NS), 1, 0))
        (pids, pi, preg, pt, pslot, plenf, psef) = cf
        (succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
         pm, pids, pi, preg, pt, pslot, plenf, psef) = process_round(
            pids, pi, preg, pt, pslot, ok_m, plenf, psef, False,
            succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit, N1)

        if _stage == 5:  # + dirty round 1
            return (jnp.sum(succ_pos), jnp.sum(s_cap), jnp.sum(r_pos),
                    jnp.sum(pm.astype(I32)))

        # ---- tail rounds: fixed NTAIL shape inside one while_loop -----
        (cf, ok_m, over) = _compact(
            pm, (pids, pi, preg, pt, pslot, plenf, psef), NTAIL)
        s_cap = s_cap.at[jnp.clip(pids, 0, NS - 1)].max(
            jnp.where(over & (pids < NS), 1, 0))
        (pids, pi, preg, pt, pslot, plenf, psef) = cf
        pm = ok_m

        def tail_cond(st):
            return (st[0] < TAIL_ROUNDS) & jnp.any(st[7][0])

        def tail_body(st):
            (rnd, succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit, pend) = st
            (pm, pids, pi, preg, pt, pslot, plenf, psef) = pend
            (succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
             pm, pids, pi, preg, pt, pslot, plenf, psef) = process_round(
                pids, pi, preg, pt, pslot, pm, plenf, psef, False,
                succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit, NTAIL)
            (cf, ok_m, over) = _compact(
                pm, (pids, pi, preg, pt, pslot, plenf, psef), NTAIL)
            s_cap = s_cap.at[jnp.clip(pids, 0, NS - 1)].max(
                jnp.where(over & (pids < NS), 1, 0))
            (pids, pi, preg, pt, pslot, plenf, psef) = cf
            return (rnd + 1, succ_pos, s_cap, r_pos, r_cnt, r_skip,
                    r_emit, (ok_m, pids, pi, preg, pt, pslot, plenf,
                             psef))

        st = (jnp.int32(0), succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
              (pm, pids, pi, preg, pt, pslot, plenf, psef))
        st = jax.lax.while_loop(tail_cond, tail_body, st)
        (_rnd, succ_pos, s_cap, r_pos, r_cnt, r_skip, r_emit,
         (pm, pids, pi, preg, pt, pslot, plenf, psef)) = st
        # unresolved after all rounds -> cap
        s_cap = s_cap.at[jnp.clip(pids, 0, NS - 1)].max(
            jnp.where(pm & (pids < NS), 4, 0))

        if _stage == 6:  # + tail rounds
            return (jnp.sum(succ_pos), jnp.sum(s_cap), jnp.sum(r_pos),
                    jnp.sum(pm.astype(I32)))

        site_capped = (s_cap > 0) & smask
        cap_lane = flag_lane(cap_lane, s_lane, site_capped)

        # ---------------- 5. segment chain walk ------------------------
        # successor site index (within the same segment)
        succ_ok = smask & (succ_pos < s_se) & (succ_pos < BIG)
        succ_idx = jnp.where(
            succ_ok, _lower_bound(s_pos, succ_pos), NS)
        succ_idx = jnp.where(
            succ_ok & (succ_idx < NS), succ_idx, NS).astype(I32)

        # walk lane starts: read heads (B) + boundary points (NSEG - B)
        Bmf = Bm2.reshape(-1)
        cumBm = jnp.cumsum(Bmf.astype(I32))
        NB = NSEG - B
        bflat = jnp.clip(
            _lower_bound(cumBm, jnp.arange(1, NB + 1, dtype=I32)), 0, BL - 1)
        bmask = jnp.arange(NB, dtype=I32) < jnp.minimum(cumBm[-1], NB)
        # lanes whose boundaries were dropped by the NB cap would
        # mis-segment -> cap
        bcum_rs = cumBm[jnp.clip(rowbase[:, 0] - 1, 0, BL - 1)]
        bcum_rs = jnp.where(rowbase[:, 0] > 0, bcum_rs, 0)
        bcum_re = cumBm[rowbase[:, 0] + (L - 1)]
        cap_lane = cap_lane | (bcum_re > jnp.maximum(bcum_rs, NB))

        starts = jnp.concatenate(
            [rowbase[:, 0], jnp.where(bmask, bflat + 1, BIG)])
        start_lane = jnp.concatenate(
            [jnp.arange(B, dtype=I32), bflat // L])
        lane_alive = starts < BIG
        wstart = jnp.clip(starts, 0, BL - 1)
        wend = jnp.where(lane_alive, se[wstart], -1)

        cur0 = _lower_bound(s_pos, starts)
        cur0c = jnp.clip(cur0, 0, NS - 1)
        cur_ok = lane_alive & (cur0 < NS) & (s_pos[cur0c] < wend)

        # pointer-doubling reachability: after round j, visited covers all
        # chain nodes within 2^(j+1) hops of a segment head.  succ_idx is
        # strictly increasing within a segment, so chains are acyclic and
        # <= segment-site-count (< 2^REACH_ROUNDS) long.
        visited = jnp.zeros(NS + 1, bool).at[
            jnp.where(cur_ok, cur0c, NS)].max(cur_ok)
        nxt = jnp.append(succ_idx, jnp.int32(NS))  # sentinel self-loop
        for _ in range(REACH_ROUNDS):
            visited = visited.at[nxt].max(visited)
            nxt = nxt[nxt]

        if _stage == 7:  # + segment chain walk (reachability)
            return (jnp.sum(visited.astype(I32)),
                    jnp.sum(cap_lane.astype(I32)))

        # ---------------- 6. splice ------------------------------------
        vis_site = visited[:NS]
        rposf = r_pos.reshape(-1)
        rcntf = r_cnt.reshape(-1)
        rskipf = r_skip.reshape(-1)
        remitf = r_emit.reshape(-1, W)
        rv = (rposf < BIG) & jnp.repeat(vis_site, SLOTS)

        (crp, crc, crs, cre), rok, rover = _compact(
            rv, (rposf, rcntf, rskipf, remitf), NR)
        cap_lane = flag_lane(cap_lane,
                             jnp.clip(rposf, 0, BL - 1) // L, rover)
        crp = jnp.where(rok, crp, BIG)
        crc = jnp.where(rok, crc, 0)
        crs = jnp.where(rok, crs, 0)

        rlane = jnp.clip(crp // L, 0, B - 1)
        rlo = _lower_bound(crp, rowbase[:, 0])              # (B,)
        rhi = _lower_bound(crp, rowbase[:, 0] + L)          # (B,)
        ridx = jnp.arange(NR, dtype=I32)
        is_first = ridx == rlo[rlane]
        pidx = jnp.clip(ridx - 1, 0, NR - 1)
        pe = jnp.where(is_first, rlane * L, crp[pidx] + crs[pidx])
        vlen = crp - pe
        cap_lane = flag_lane(cap_lane, rlane, rok & (vlen < 0))
        vlen = jnp.clip(vlen, 0, L)
        slen = jnp.where(rok, vlen + crc, 0)

        Sx = jnp.concatenate(
            [jnp.zeros(1, I32), jnp.cumsum(slen.astype(I32))])  # (NR+1,)
        SxLo = Sx[rlo]                                       # (B,)
        ostart_v = Sx[ridx] - SxLo[rlane]
        ostart_e = ostart_v + vlen
        body_len = Sx[rhi] - SxLo
        nrec = rhi - rlo
        has_rec = rhi > rlo
        lastx = jnp.clip(rhi - 1, 0, NR - 1)
        last_end = jnp.where(has_rec, crp[lastx] + crs[lastx],
                             rowbase[:, 0])
        tail_len = lens - (last_end - rowbase[:, 0])
        out_len = body_len + tail_len
        cap_lane = cap_lane | (out_len > L) | (tail_len < 0)
        out_len = jnp.clip(out_len, 0, L)

        marks = jnp.zeros(BL + 1, dtype=I32)
        mv = jnp.where(rok & (ostart_v >= 0) & (ostart_v < L),
                       rlane * L + ostart_v, BL)
        me = jnp.where(rok & (ostart_e >= 0) & (ostart_e < L),
                       rlane * L + ostart_e, BL)
        mt = jnp.where((body_len >= 0) & (body_len < L),
                       rowbase[:, 0] + body_len, BL)
        marks = marks.at[mv].add(1)
        marks = marks.at[me].add(1)
        marks = marks.at[mt].add(1)
        segc = jnp.cumsum(marks[:BL].reshape(B, L), axis=1)
        order = jnp.clip(segc - 1, 0, 2 * NR)

        r_of = jnp.clip(rlo[:, None] + order // 2, 0, NR - 1)
        is_tail = order >= 2 * nrec[:, None]
        is_emit = ((order & 1) == 1) & ~is_tail
        segstart = jnp.where(
            is_tail, body_len[:, None],
            jnp.where(is_emit, ostart_e[r_of], ostart_v[r_of]))
        o = pos  # (1, L) broadcast
        within = o - segstart
        src = jnp.where(is_tail, last_end[:, None] + within,
                        pe[r_of] + within)
        wsel = jnp.clip(within // 31, 0, W - 1)
        eword = cre[r_of, wsel]
        ecode = ((eword >> (2 * (within % 31)).astype(U64)) & _u(3)
                 ).astype(jnp.uint8)
        out_b = jnp.where(is_emit, ecode,
                          codes[jnp.clip(src, 0, BL - 1)])
        out = dc.pack_codes(
            jnp.where(o < out_len[:, None], out_b, jnp.uint8(0)))

        def _cnt(m):
            return jnp.sum(m.astype(I32))

        aux = jnp.stack([
            jnp.minimum(n_sites, NS),
            _cnt(site_capped & (s_cap == 1)),   # capacity overflow
            _cnt(site_capped & (s_cap == 2)),   # attempt cap (walk/err)
            _cnt(site_capped & (s_cap == 3)),   # boundary crossing
            _cnt(site_capped & (s_cap == 4)),   # rounds exhausted
            _cnt(visited[:NS] & smask),         # visited sites
            _cnt(rok),                          # applied records
            _cnt(cap_lane),                     # capped lanes
        ])
        return out, out_len, cap_lane, aux

    return jax.jit(passfn)


# ---------------------------------------------------------------------------
# Batch driver: pipelined chunks, 2-bit packed device IO.
# ---------------------------------------------------------------------------

_PURE_LUT = np.zeros(256, dtype=bool)
_PURE_LUT[[65, 67, 71, 84]] = True  # 'A' 'C' 'G' 'T'
_DECODE = np.frombuffer(b"ACTG", dtype=np.uint8)


def make_reverse_fn(B: int, L: int):
    """Jitted packed-codes reversal of the length-n prefix per lane
    (the two-side reverse pass works on plain-reversed bytes,
    src/lib.rs:110-117)."""

    @jax.jit
    def rev(packed, lens):
        codes = dc.unpack_codes(packed, L)
        pos = jnp.arange(L, dtype=I32)[None, :]
        idx = jnp.where(pos < lens[:, None], lens[:, None] - 1 - pos, pos)
        r = jnp.take_along_axis(codes, jnp.clip(idx, 0, L - 1), axis=1)
        return dc.pack_codes(r)

    return rev


class Tpu2Corrector(TpuCorrector):
    """Site-parallel batched device corrector (engine v2).

    Same public contract as TpuCorrector (bit-exact, cap->oracle
    fallback); passes are compiled per (strategy, L, B).

    Driver shape (all tuned against the axon-relay cost model in
    PERF_NOTES.md — a dispatch round trip costs ~24 ms and host<->device
    moves ~0.03-0.06 GB/s):

    * reads move as 2-bit packed codes both ways (4x less transfer);
      non-ACGT-uppercase reads are routed straight to the host oracle
      (they are the only case where codes lose information);
    * every chunk's full chain is enqueued before any result is fetched,
      so the device queue never drains between chunks;
    * length buckets use a 2x ladder (pad waste bound ~2x + slack);
    * host-oracle fallbacks are batched into one native-engine call.
    """

    MAX_B = 256
    MIN_BUCKET = 2048

    def _bucket_len2(self, n: int) -> int:
        b = self.MIN_BUCKET
        while b < n:
            b *= 2
        return b

    def _plan(self, seqs, skip):
        """Group read indices into (idxs, L, B) chunks by length bucket."""
        order = np.argsort([len(s) for s in seqs], kind="stable")
        groups: dict[int, list[int]] = {}
        for idx in order:
            if int(idx) in skip:
                continue
            groups.setdefault(self._bucket_len2(len(seqs[idx]) + 8),
                              []).append(int(idx))
        plans = []
        for bucket in sorted(groups):
            idxs = groups[bucket]
            L = bucket + max(64, bucket // 8)  # slack for net insertions
            B = min(self.MAX_B, max(8, self.TARGET_ELEMS // L))
            if self.mesh is not None:
                D = self.mesh.size
                B = -(-B // D) * D
            for lo in range(0, len(idxs), B):
                plans.append((idxs[lo : lo + B], L, B))
        return plans

    def correct_batch(self, seqs, two_side: bool):
        out = [None] * len(seqs)
        impure = {
            i for i, s in enumerate(seqs)
            if not _PURE_LUT[np.frombuffer(s, np.uint8)].all()
        }
        plans = self._plan(seqs, impure)
        handles = [
            self._dispatch_chunk([seqs[i] for i in idxs], L, B, two_side)
            for idxs, L, B in plans
        ]
        fb_idx = sorted(impure)
        for (idxs, L, B), (a, n, cap) in zip(plans, handles):
            a_np = np.asarray(a)[: len(idxs)]
            n_np = np.asarray(n)
            cap_np = np.asarray(cap)
            codes = np.empty((len(idxs), L), np.uint8)
            for sh in range(4):
                codes[:, sh::4] = (a_np >> (2 * sh)) & 3
            for b, i in enumerate(idxs):
                if cap_np[b]:
                    fb_idx.append(i)
                else:
                    out[i] = _DECODE[codes[b, : n_np[b]]].tobytes()
        if fb_idx:
            fixed = self._oracle_correct_many(
                [seqs[i] for i in fb_idx], two_side)
            for i, s in zip(fb_idx, fixed):
                out[i] = s
        return out

    def _get_pass2(self, strategy: str, L: int, B: int):
        key = ("v2", strategy, L, B)
        fn = self._pass_cache.get(key)
        if fn is None:
            fn = make_pass2_fn(self.k, strategy, self.c, self.ms, self.c,
                               B, L, self.probe_kind)
            self._pass_cache[key] = fn
        return fn

    def _get_reverse(self, L: int, B: int):
        key = ("rev", L, B)
        fn = self._pass_cache.get(key)
        if fn is None:
            fn = make_reverse_fn(B, L)
            self._pass_cache[key] = fn
        return fn

    def _dispatch_chunk(self, seqs, L: int, B: int, two_side: bool):
        """Enqueue the full chain for one chunk; returns device handles
        (packed codes, out_lens, cap) without synchronizing."""
        assert len(seqs) <= B and L % 4 == 0
        codes = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for b, s in enumerate(seqs):
            arr = np.frombuffer(s, dtype=np.uint8)
            codes[b, : len(arr)] = (arr >> 1) & 3
            lens[b] = len(arr)
        b4 = codes.reshape(B, L // 4, 4)
        packed = (b4[..., 0] | (b4[..., 1] << 2) | (b4[..., 2] << 4)
                  | (b4[..., 3] << 6))

        if self.mesh is not None:
            from br_tpu.parallel.mesh import replicated, shard_batch

            self.table = replicated(self.mesh, self.table)
            a, n = shard_batch(self.mesh, packed, lens)
        else:
            a = jax.device_put(packed)
            n = jax.device_put(lens)
        cap_any = jnp.zeros(B, dtype=bool)
        rev_fn = self._get_reverse(L, B)

        def run_chain(a, n, cap_any):
            for strat in self.corrections:
                fn = self._get_pass2(strat, L, B)
                a, n, cap, _aux = fn(self.table, a, n)
                cap_any = cap_any | cap
            return a, n, cap_any

        a, n, cap_any = run_chain(a, n, cap_any)
        if not two_side:
            a = rev_fn(a, n)
            a, n, cap_any = run_chain(a, n, cap_any)
            a = rev_fn(a, n)
        return a, n, cap_any

    def _oracle_correct_many(self, seqs, two_side: bool):
        if self._oracle is None:
            self._oracle_correct(b"", two_side)  # builds self._oracle
        return self._oracle.correct_batch(seqs, two_side)
