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
    _alt_info,
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
#: dirty error_len walk cap (graph/gap-size with a perturbed register).
#: dirty rounds are rare; tight caps keep their nested loops cheap and
#: spill to the host fallback instead.
ERR_CAP = 64
WALK_MAX_DIRTY = 64

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


def _compact(mask, fields, cap: int, fill=0):
    """Compact `fields` (arrays over the mask axis) to `cap` slots.

    Returns (compacted fields, slot-valid mask, overflow mask over the
    ORIGINAL axis marking entries that did not fit)."""
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
    return out, ok, overflow


def _pack_words(codes_list):
    """Pack a python list of 2-bit code scalars into W u64 words."""
    words = [jnp.zeros((), U64) for _ in range(W)]
    for t, c in enumerate(codes_list):
        wi, sh = divmod(t, 31)
        words[wi] = words[wi] | (c.astype(U64) << _u(2 * sh))
    return jnp.stack(words)


# ---------------------------------------------------------------------------
# Graph / GapSize attempts, parameterized by the error_len implementation
# (pure sites use the O(1) jump table; dirty ones walk with a cap).
# ---------------------------------------------------------------------------


def _unique_walk(probe, k: int, corr, alt_code, first_correct,
                 use_fc, max_steps, enabled, walk_cap: int = WALK_MAX):
    """Unique-successor de Bruijn walk (graph.rs:44-85, gap_size.rs:44-89)
    capped at WALK_MAX steps (cap -> host fallback).

    ``use_fc`` is a per-lane boolean: True = graph mode (walk while valid,
    accept on reaching ``first_correct``); False = fill mode (walk exactly
    ``max_steps`` unique successors)."""
    RUN, ACCEPT, DECLINE, CAP = 0, 1, 2, 3

    buf0 = jnp.zeros(W, dtype=U64).at[0].set(alt_code.astype(U64))
    ring0 = jnp.full(RING, ~_u(0)).at[0].set(corr)
    init = (corr, jnp.int32(1), buf0, ring0, jnp.int32(1),
            jnp.where(enabled, jnp.int32(RUN), jnp.int32(DECLINE)))

    def cond(st):
        _wk, n, _buf, _ring, _rpos, status = st
        more = use_fc | ((n - 1) < max_steps)
        return (status == RUN) & more

    def body(st):
        wk, n, buf, ring, rpos, status = st
        cands = jnp.stack([add_nuc(wk, jnp.uint8(a), k) for a in range(4)])
        okv = probe(cands)
        ns = jnp.sum(okv.astype(I32))
        sa = jnp.sum(jnp.arange(4, dtype=U64) * okv.astype(U64))
        wk2 = add_nuc(wk, sa.astype(jnp.uint8), k)
        branch_fail = ns != 1
        revisit = jnp.any(ring == wk2)
        accept = use_fc & (wk2 == first_correct)
        capped = n >= walk_cap

        wi = n // 31
        sh = ((n % 31) * 2).astype(U64)
        buf = buf.at[jnp.clip(wi, 0, W - 1)].set(
            buf[jnp.clip(wi, 0, W - 1)] | (sa << sh))
        slot = 1 + ((rpos - 1) % (RING - 1))
        ring = ring.at[slot].set(wk2)
        # CAP outranks ACCEPT: at n == walk_cap the buf slot write above
        # clips, so an acceptance on the cap step would emit a corrupted
        # path — raise cap (-> exact host fallback) instead.
        status = jnp.where(
            branch_fail | revisit, DECLINE,
            jnp.where(capped, CAP, jnp.where(accept, ACCEPT, RUN)))
        return (wk2, n + 1, buf, ring, rpos + 1, jnp.int32(status))

    wk, n, buf, _r, _p, status = jax.lax.while_loop(cond, body, init)
    ok = jnp.where(use_fc, status == ACCEPT, status == RUN)
    return ok, status == CAP, buf, n, wk


def make_graph_attempt2(probe, codes, k: int, err_fn,
                        walk_cap: int = WALK_MAX):
    def attempt(i, kmer, length):
        err_len, fc, ecap = err_fn(i, kmer, length)
        nalts, corr = _alt_info(probe, kmer)
        alt_code = corr & _u(3)
        ok_w, cap, buf, n, wk = _unique_walk(
            probe, k, corr, alt_code, fc, jnp.bool_(True),
            jnp.int32(walk_cap), nalts == 1, walk_cap)
        ok = (nalts == 1) & ok_w
        return AttemptOut(ok, wk, err_len + 1, buf, n,
                          ((nalts == 1) & cap) | ecap)

    return attempt


def make_gap_attempt2(probe, codes, k: int, c: int, err_fn,
                      walk_cap: int = WALK_MAX):
    def attempt(i, kmer, length):
        err_len, fc, ecap = err_fn(i, kmer, length)
        nalts, corr = _alt_info(probe, kmer)
        alt_code = corr & _u(3)

        is_graph = err_len < k
        gap = jnp.maximum(err_len - k, 0)
        is_one = err_len == k
        is_fill = err_len > k
        # one walk serves both graph mode and fill mode (per-lane select)
        ok_w, cap_w, buf, n, wk = _unique_walk(
            probe, k, corr, alt_code, fc, is_graph, gap,
            (is_graph | is_fill) & (nalts == 1), walk_cap)
        one_att = make_one_attempt(probe, codes, length, k, c)
        o = one_att(i, kmer)

        ok = jnp.where(is_one, o.ok, (nalts == 1) & ok_w)
        cap_hit = ~is_one & (nalts == 1) & cap_w
        new_kmer = jnp.where(is_one, o.new_kmer, wk)
        consumed = jnp.where(is_graph, err_len + 1,
                             jnp.where(is_one, o.consumed, n))
        cnt = jnp.where(is_one, o.cnt, n)
        emit = jnp.where(is_one,
                         jnp.zeros_like(buf).at[0].set(o.emit[0]), buf)
        return AttemptOut(ok, new_kmer, consumed, emit, cnt,
                          cap_hit | ecap)

    return attempt


def _dirty_err_fn(probe, codes, k: int, err_cap: int = ERR_CAP):
    """error_len by explicit walk (mod.rs:130-152) for dirty registers,
    capped at ERR_CAP steps."""

    def err_fn(i, kmer, length):
        rem = length - i

        def cond(st):
            return ~st[2]

        def body(st):
            j, km, done, found, cap = st
            j2 = j + 1
            at_end = j2 >= rem
            km2 = jnp.where(at_end, km,
                            add_nuc(km, _code_at(codes, i + j2), k))
            f = ~at_end & probe(km2)
            capped = j2 >= err_cap
            return (j2, km2, at_end | f | capped, f, cap | capped)

        j, km, _d, _f, cap = jax.lax.while_loop(
            cond, body, (jnp.int32(0), kmer, jnp.bool_(False),
                         jnp.bool_(False), jnp.bool_(False)))
        return j, km, cap

    return err_fn


# ---------------------------------------------------------------------------
# The pass builder.
# ---------------------------------------------------------------------------


def make_pass2_fn(k: int, strategy: str, c: int, ms: int, nb: int,
                  B: int, L: int, probe_kind: str):
    """One jitted (table, ascii (B,L) u8, lens (B,) i32) ->
    (out (B,L) u8, out_lens (B,) i32, cap (B,) bool, aux (8,) i32);
    aux = (sites, cap-overflow, cap-attempt, cap-boundary, cap-rounds,
    visited sites, applied records, capped lanes) diagnostic counters."""

    BL = B * L
    OFFSET = k + OFF_MARGIN
    # sized ~1.5x over the worst observed corpus chunk (sites <= 0.55% of
    # positions after gating on real long-read data); overflow -> cap ->
    # exact host fallback, so tight capacities trade rare fallbacks for
    # throughput on every pass.
    NS = max(512, BL // 64)          # site capacity
    NSB = max(256, NS // 2)          # gate-surviving sites (full attempt)
    N1 = max(256, NS // 2)
    NTAIL = max(128, NS // 4)
    NR = NS + NS // 2                # record capacity
    NSEG = B + max(256, BL // 96)    # walk-lane capacity
    # pointer-doubling rounds: after r rounds visited covers 2^r hops from
    # a segment head; chains are strictly increasing in site index, hence
    # <= NS long, so ceil(log2(NS+1)) rounds always suffice.
    REACH_ROUNDS = NS.bit_length()
    DONE_PURE, DONE_END, PENDING = 0, 1, 2

    def passfn(table, ascii_in, lens):
        if probe_kind == "solid":
            probe = dc.make_solid_probe(table, k)
        else:
            probe = dc.make_hash_probe(table, k)

        # ---------------- 1. dense precompute --------------------------
        codes2 = dc.encode_ascii(ascii_in)              # (B, L)
        kmers2 = dc.rolling_kmers(codes2, k)            # (B, L)
        pos = jnp.arange(L, dtype=I32)[None, :]
        lensb = lens[:, None]
        V2 = probe(kmers2) & (pos >= k - 1) & (pos < lensb)
        Vprev = jnp.pad(V2[:, :-1], ((0, 0), (1, 0)))
        T2 = Vprev & ~V2 & (pos >= k) & (pos < lensb)

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
        s_reg = kmers[sflat]
        s_pos = jnp.where(smask, sflat, BIG)

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
            km_end = kmers[jnp.clip(end_idx, 0, BL - 1)]
            return j, km_end, jnp.bool_(False)

        dirty_err = _dirty_err_fn(probe, codes, k)

        def build_attempt(err_fn, walk_cap=WALK_MAX):
            if strategy == "one":
                def att(i, kmer, length):
                    return make_one_attempt(probe, codes, length, k, c)(
                        i, kmer)
            elif strategy == "two":
                def att(i, kmer, length):
                    return make_two_attempt(probe, codes, length, k, c)(
                        i, kmer)
            elif strategy == "greedy":
                ascii_flat = ascii_in.reshape(-1)

                def att(i, kmer, length):
                    return make_greedy_attempt(
                        probe, codes, length, k, ms, nb,
                        ascii_arr=ascii_flat)(i, kmer)
            elif strategy == "graph":
                g = make_graph_attempt2(probe, codes, k, err_fn,
                                        walk_cap)

                def att(i, kmer, length):
                    return g(i, kmer, length)
            elif strategy == "gap-size":
                g = make_gap_attempt2(probe, codes, k, c, err_fn,
                                      walk_cap)

                def att(i, kmer, length):
                    return g(i, kmer, length)
            else:
                raise ValueError(strategy)
            return jax.vmap(att)

        attempt_pure = build_attempt(pure_err_fn)
        attempt_dirty = build_attempt(dirty_err, WALK_MAX_DIRTY)

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
        ascii_flat = ascii_in.reshape(-1)
        out_b = jnp.where(is_emit, dc.decode_codes(ecode),
                          ascii_flat[jnp.clip(src, 0, BL - 1)])
        out = jnp.where(o < out_len[:, None], out_b, jnp.uint8(0))

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
# Batch driver: the v1 driver with v2 pass programs (fixed-B buckets).
# ---------------------------------------------------------------------------


class Tpu2Corrector(TpuCorrector):
    """Site-parallel batched device corrector (engine v2).

    Same public contract as TpuCorrector (bit-exact, cap->oracle
    fallback); passes are compiled per (strategy, L, B).  Buckets use a
    coarse 4x ladder starting at 2048 and lanes are capped at MAX_B —
    compile time grows steeply with B, and since the pass cost is
    dominated by per-site work (not lanes), small chunks pipeline fine.
    """

    MAX_B = 256
    MIN_BUCKET = 2048

    def _bucket_len2(self, n: int) -> int:
        # 4x ladder, switching to 2x above 32k to bound pad waste on the
        # long-read tail: 2048, 8192, 32768, 65536, 131072, ...
        b = self.MIN_BUCKET
        while b < n:
            b *= 2 if b >= 32768 else 4
        return b

    def correct_batch(self, seqs, two_side: bool):
        out = [None] * len(seqs)
        order = np.argsort([len(s) for s in seqs], kind="stable")
        groups: dict[int, list[int]] = {}
        for idx in order:
            groups.setdefault(self._bucket_len2(len(seqs[idx]) + 8),
                              []).append(idx)

        for bucket, idxs in groups.items():
            L = bucket + max(64, bucket // 8)
            B = min(self.MAX_B, max(8, self.TARGET_ELEMS // L))
            for lo in range(0, len(idxs), B):
                chunk = idxs[lo : lo + B]
                res = self._correct_chunk([seqs[i] for i in chunk], L,
                                          two_side)
                for i, seq in zip(chunk, res):
                    out[i] = seq
        return out

    def _get_pass2(self, strategy: str, L: int, B: int):
        key = ("v2", strategy, L, B)
        fn = self._pass_cache.get(key)
        if fn is None:
            fn = make_pass2_fn(self.k, strategy, self.c, self.ms, self.c,
                               B, L, self.probe_kind)
            self._pass_cache[key] = fn
        return fn

    def _correct_chunk(self, seqs, L: int, two_side: bool):
        from br_tpu.correct.engine import _reverse_batch

        B = min(self.MAX_B, max(8, self.TARGET_ELEMS // L))
        if self.mesh is not None:
            D = self.mesh.size
            B = -(-B // D) * D
        assert len(seqs) <= B
        ascii_in = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for b, s in enumerate(seqs):
            ascii_in[b, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            lens[b] = len(s)

        if self.mesh is not None:
            from br_tpu.parallel.mesh import replicated, shard_batch

            self.table = replicated(self.mesh, self.table)
            a, n = shard_batch(self.mesh, ascii_in, lens)
        else:
            a = jax.device_put(ascii_in)
            n = jax.device_put(lens)
        cap_any = jnp.zeros(B, dtype=bool)

        def run_chain(a, n, cap_any):
            for strat in self.corrections:
                fn = self._get_pass2(strat, L, B)
                a, n, cap, _aux = fn(self.table, a, n)
                cap_any = cap_any | cap
            return a, n, cap_any

        a, n, cap_any = run_chain(a, n, cap_any)
        if not two_side:
            a = _reverse_batch(a, n)
            a, n, cap_any = run_chain(a, n, cap_any)
            a = _reverse_batch(a, n)

        a_np = np.asarray(a)
        n_np = np.asarray(n)
        cap_np = np.asarray(cap_any)
        results = []
        fallback = [b for b in range(len(seqs)) if cap_np[b]]
        fixed = {}
        if fallback:
            fb = self._oracle_correct_many(
                [seqs[b] for b in fallback], two_side)
            fixed = dict(zip(fallback, fb))
        for b, s in enumerate(seqs):
            if b in fixed:
                results.append(fixed[b])
            else:
                results.append(a_np[b, : n_np[b]].tobytes())
        return results

    def _oracle_correct_many(self, seqs, two_side: bool):
        if self._oracle is None:
            self._oracle_correct(b"", two_side)  # builds self._oracle
        return self._oracle.correct_batch(seqs, two_side)
