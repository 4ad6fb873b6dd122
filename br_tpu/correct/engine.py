"""The v1 TPU correction engine — RETAINED AS A DIFFERENTIAL TARGET ONLY.

Scope (VERDICT r3 item 10): superseded by v2 (bucketed, hash-set-capable)
and v3 (flat-packed, the production path) on every production route and
no longer reachable from the CLI or `make_corrector`.  It stays because
its small-shape pass programs compile in seconds on CPU, which makes it
the only device engine cheap enough to run the ENTIRE ported reference
catalog against the oracle (tests/test_engine.py) — an independent
third implementation of the scan/repair semantics that cross-checks
v2/v3 and the native engine.

TPU-first re-design of the reference's per-read scan-and-fix state machine
(src/correct/mod.rs:53-107) for batched execution:

* Reads are bucketed by length, padded to (B, L), and corrected by a
  **vmapped two-level ``lax.while_loop``** per strategy pass:

  - an inner *stepping* loop advances each lane to its next repair site.
    In the "pure" state (register == precomputed input k-mer) it does not
    step base-by-base: per-pass vectorized precomputation gives every
    position's rolling k-mer, its bitfield validity, and next-invalid /
    next-valid jump tables, so whole valid runs are skipped in O(1).
  - an outer loop runs one *repair attempt* per iteration (One/Two
    scenario enumeration, Graph/GapSize walks, Greedy walk+DP), vectorized
    across the batch.  Attempts are rare (valid->invalid edges only), so
    hoisting them out of the stepping loop keeps the common step cheap
    under vmap's execute-both-branches semantics.

* Corrections are recorded as an **edit list** (input position, emitted
  2-bit bases packed in u64 words, consumed count) instead of writing an
  output buffer in the loop; the output is then **spliced vectorized** in
  one pass (segment boundaries via cumsum + searchsorted-style gather).
  Verbatim segments copy the original ASCII bytes (preserving any
  non-ACGT input bytes exactly like the reference); emitted bases decode
  to uppercase ACTG.

* The membership probe is one uint32 gather from the HBM-resident
  bitfield (or a branchless binary search for the large-k sorted table).

Exactness: semantics mirror the scalar oracle (br_tpu.correct.reference)
bit for bit, enforced by tests/test_engine.py on the ported catalog, on
fuzzed corpora, and on the real corpus.  Two engineered bounds exist —
MAX_WALK on Graph/GapSize traversals and the edit-record capacity — and
both raise a per-read ``cap_hit`` flag that makes the host transparently
re-correct that read with the oracle, so results never silently diverge.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from br_tpu.correct import device_codec as dc
from br_tpu.correct.device_codec import U64, _u, add_nuc

I32 = jnp.int32
NEG_INF = np.int32(-(1 << 20))

#: Graph/GapSize walk bound; a longer genuine path declines with cap_hit
#: and the read falls back to the oracle (rust walks are unbounded,
#: graph.rs:61-82).
MAX_WALK = 248
_WALK_WORDS = (MAX_WALK + 30) // 31
#: loop-guard ring size (full viewed-set equivalence argued in the module
#: docstring of tests/test_engine.py).
RING = 32

# traceback layer codes shared with the host aligner
OP_MATCH, OP_SUBST, OP_DEL, OP_INS, TB_START = 0, 1, 2, 3, 4


class AttemptOut(NamedTuple):
    ok: jax.Array        # correction applies
    new_kmer: jax.Array  # register after replaying emitted bases
    consumed: jax.Array  # input positions to skip (i += consumed)
    emit: jax.Array      # (W,) u64 words, 31 2-bit bases each, LSB-first
    cnt: jax.Array       # emitted base count
    cap: jax.Array       # engineered bound hit -> host oracle fallback


def _emit_words(strategy: str) -> int:
    return {"one": 1, "two": 1, "graph": _WALK_WORDS, "gap-size": _WALK_WORDS,
            "greedy": 2}[strategy]


def _pack(words, n, code):
    """Append one 2-bit base to a (W,)-u64 packed buffer at position n."""
    w = n // 31
    sh = (n % 31) * 2
    return words.at[w].set(words[w] | (code.astype(U64) << sh.astype(U64)))


# ---------------------------------------------------------------------------
# Per-strategy attempt builders.  All run single-lane (vmapped by the pass);
# `probe` is captured over the device bitfield.  Static ints: k, c, ...
# ---------------------------------------------------------------------------


def _alt_info(probe, kmer):
    """'Exactly one alternative last base' gate (mod.rs:114-116)."""
    base = (kmer >> _u(2)) << _u(2)
    cands = base ^ jnp.arange(4, dtype=U64)
    ok = probe(cands)
    n = jnp.sum(ok.astype(I32))
    alt = jnp.sum(jnp.arange(4, dtype=U64) * ok.astype(U64))
    return n, base ^ alt


def _code_at(codes, idx):
    """Clamped gather; masked-out reads may touch garbage harmlessly."""
    return codes[jnp.clip(idx, 0, codes.shape[0] - 1)]


def make_one_attempt(probe, codes, length, k: int, c: int):
    """One-error scenarios I/S/D (exist/one.rs + exist/mod.rs:120-149)."""

    def attempt(i, kmer):
        rem = length - i
        nalts, corr = _alt_info(probe, kmer)
        corr_ok = probe(corr)

        # Three absorb streams from `corr`, offsets 0/1/2, c+1 steps each:
        # first c probes feed get_score, the (c+1)-th feeds one_more.
        keep = []
        one_more = []
        for off in (0, 1, 2):
            km = corr
            valids = []
            for t in range(c + 1):
                km = add_nuc(km, _code_at(codes, i + off + t), k)
                valids.append(probe(km))
            score_ok = (off + c <= rem) & corr_ok
            for t in range(c):
                score_ok = score_ok & valids[t]
            keep.append(score_ok)
            one_more.append((rem > c + off + 1) & valids[c])

        keep = jnp.stack(keep)          # order D(0), S(1), I(2) — selection
        one_more = jnp.stack(one_more)  # is by uniqueness, order-free
        nk = jnp.sum(keep.astype(I32))
        keep2 = keep & one_more
        nk2 = jnp.sum(keep2.astype(I32))

        sel = jnp.where(nk == 1, keep, keep2)
        ok = (nalts == 1) & ((nk == 1) | ((nk > 1) & (nk2 == 1)))
        offset = jnp.sum(jnp.arange(3, dtype=I32) * sel.astype(I32))

        emit = jnp.zeros(1, dtype=U64).at[0].set(corr & _u(3))
        return AttemptOut(ok, corr, offset, emit, jnp.int32(1),
                          jnp.bool_(False))

    return attempt


def make_two_attempt(probe, codes, length, k: int, c: int):
    """The 13 two-error scenarios (exist/two.rs), as a masked parallel
    evaluation of the apply/score/one_more/correct tables.

    Scenario order (two.rs:35-50) is irrelevant to the outcome because the
    Exist engine only accepts a *unique* survivor."""

    def attempt(i, kmer):
        rem = length - i
        nalts, corr = _alt_info(probe, kmer)

        def absorb(km, idx):
            return add_nuc(km, _code_at(codes, idx), k)

        def alt_next(km):
            """Unique valid extension of km (alt_nucs(vk, km<<2))."""
            cands = jnp.stack([add_nuc(km, jnp.uint8(a), k) for a in range(4)])
            okv = probe(cands)
            n = jnp.sum(okv.astype(I32))
            alt = jnp.sum(jnp.arange(4, dtype=U64) * okv.astype(U64))
            return n == 1, add_nuc(km, alt.astype(jnp.uint8), k)

        def alt_last(km):
            """Unique replacement of km's last base (alt_nucs(vk, km))."""
            n, repl = _alt_info(probe, km)
            return n == 1, repl

        # -- apply table: (ok, kmer2) per scenario; offsets are static ----
        scen = {}
        t1 = absorb(corr, i + 1)
        t1_valid = probe(t1)

        scen["II"] = (jnp.bool_(True), corr)                       # off 3
        scen["IS"] = (jnp.bool_(True), corr)                       # off 2
        u, km2 = alt_last(t1)                                       # SS off 2
        scen["SS"] = ((rem >= 2) & ~t1_valid & u, km2)
        u, km2 = alt_next(corr)                                     # SD off 1
        scen["SD"] = ((rem >= 1) & u, km2)
        u, km2 = alt_next(corr)                                     # DD off 0
        scen["DD"] = (u, km2)
        t3 = absorb(corr, i + 3)                                    # ICI off 4
        scen["ICI"] = ((rem >= 4) & probe(t3), t3)
        u, km2 = alt_last(t1)                                       # ICS off 3
        scen["ICS"] = ((rem >= 4) & ~t1_valid & u, km2)
        second = absorb(corr, i + 2)                                # ICD off 3
        u, km2 = alt_next(second)
        scen["ICD"] = ((rem >= 4) & u, km2)
        sci = absorb(t1, i + 3)                                     # SCI off 4
        scen["SCI"] = (jnp.bool_(rem >= 4), sci)
        t2 = absorb(t1, i + 2)                                      # SCS off 3
        u, km2 = alt_last(t2)
        scen["SCS"] = ((rem >= 3) & t1_valid & ~probe(t2) & u, km2)
        u, km2 = alt_next(t1)                                       # SCD off 2
        scen["SCD"] = ((rem >= 2) & u, km2)
        scen["DCI"] = (jnp.bool_(rem >= 4), sci)                    # DCI off 4
        t0 = absorb(corr, i + 0)                                    # DCD off 1
        u, km2 = alt_next(t0)
        scen["DCD"] = ((rem >= 2) & u, km2)

        NAMES = ("II", "IS", "SS", "SD", "DD", "ICI", "ICS", "ICD",
                 "SCI", "SCS", "SCD", "DCI", "DCD")
        APPLY_OFF = (3, 2, 2, 1, 0, 4, 3, 3, 4, 3, 2, 4, 1)
        CORRECT_OFF = (2, 2, 2, 1, 0, 3, 4, 2, 4, 3, 2, 1, 1)
        # emitted bases per scenario, as (count, extractor)
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

        keeps, one_mores, kmers2 = [], [], []
        emit_words, emit_cnts, new_kmers, offs_c = [], [], [], []
        for s, name in enumerate(NAMES):
            a_ok, km2 = scen[name]
            off_a = APPLY_OFF[s]
            off_c = CORRECT_OFF[s]
            # get_score (exist/mod.rs:21-47): valid(kmer2), bounds, c probes
            km = km2
            score_ok = a_ok & probe(km2) & (off_a + c <= rem)
            for t in range(c):
                km = absorb(km, i + off_a + t)
                score_ok = score_ok & probe(km)
            keeps.append(score_ok)

            # correct(): emitted bases + consumed (two.rs:258-325)
            bases = EMITS[name](km2)
            ew = jnp.zeros(1, dtype=U64)
            for t, b in enumerate(bases):
                ew = ew.at[0].set(ew[0] | (b << _u(2 * t)))
            emit_words.append(ew[0])
            emit_cnts.append(len(bases))
            offs_c.append(off_c)

            # register after replay: (kmer>>2) absorbing emitted bases
            nk = kmer >> _u(2)
            for b in bases:
                nk = add_nuc(nk, b.astype(jnp.uint8), k)
            new_kmers.append(nk)

            # one_more (exist/mod.rs:49-70): corr>>2, replay emits, read
            # c+1 bases from off_c, single final probe
            om = corr >> _u(2)
            for b in bases:
                om = add_nuc(om, b.astype(jnp.uint8), k)
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
        selU = sel.astype(U64)
        consumed = jnp.sum(jnp.array(offs_c, dtype=I32) * selI)
        cnt = jnp.sum(jnp.array(emit_cnts, dtype=I32) * selI)
        emit0 = jnp.sum(jnp.stack(emit_words) * selU)
        new_kmer = jnp.sum(jnp.stack(new_kmers) * selU)

        emit = jnp.zeros(1, dtype=U64).at[0].set(emit0)
        return AttemptOut(ok, new_kmer, consumed, emit, cnt, jnp.bool_(False))

    return attempt


def _error_len_walk(probe, codes, length, k: int, i, kmer):
    """error_len (mod.rs:130-152): absorb until valid again; returns
    (error_len, kmer_at_end, found_valid)."""

    rem = length - i

    def cond(st):
        return ~st[2]

    def body(st):
        j, km, done, found = st
        j2 = j + 1
        at_end = j2 >= rem
        km2 = jnp.where(at_end, km, add_nuc(km, _code_at(codes, i + j2), k))
        f = ~at_end & probe(km2)
        return (j2, km2, at_end | f, f)

    j, km, _done, found = jax.lax.while_loop(
        cond, body, (jnp.int32(0), kmer, jnp.bool_(False), jnp.bool_(False)))
    return j, km, found


def _unique_path_walk(probe, k: int, corr, alt_code, first_correct,
                      use_first_correct: bool, max_steps, enabled):
    """Shared de Bruijn unique-path walk (graph.rs:44-85,
    gap_size.rs:44-89): advance while the successor is unique, guard
    against revisits, optionally stop at `first_correct`.

    Returns (ok, cap, emit_words, cnt, final_kmer).  The visit guard is a
    ring of the last RING k-mers with the start pinned in slot 0; combined
    with the MAX_WALK cap this declines exactly when the reference does
    (a revisit in a unique-successor walk implies a cycle).  ``enabled``
    short-circuits lanes that will not use this walk's result, so the
    batched while_loop does not pay for them."""

    RUN, ACCEPT, DECLINE, CAP = 0, 1, 2, 3

    buf0 = jnp.zeros(_WALK_WORDS, dtype=U64).at[0].set(alt_code.astype(U64))
    ring0 = jnp.full(RING, ~_u(0)).at[0].set(corr)

    init = (corr, jnp.int32(1), buf0, ring0, jnp.int32(1),
            jnp.where(enabled, jnp.int32(RUN), jnp.int32(DECLINE)))

    def cond(st):
        wk, n, buf, ring, rpos, status = st
        more = (n - 1) < max_steps if not use_first_correct else True
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
        accept = use_first_correct & (wk2 == first_correct)
        capped = n >= MAX_WALK

        buf = _pack(buf, n, sa)
        slot = 1 + ((rpos - 1) % (RING - 1))  # slot 0 pinned to the start
        ring = ring.at[slot].set(wk2)

        # CAP outranks ACCEPT: at n == MAX_WALK the _pack write above
        # clips, so an acceptance on the cap step would emit a corrupted
        # path — raise cap (-> exact host fallback) instead.
        status = jnp.where(
            branch_fail | revisit, DECLINE,
            jnp.where(capped, CAP, jnp.where(accept, ACCEPT, RUN)))
        return (wk2, n + 1, buf, ring, rpos + 1, jnp.int32(status))

    wk, n, buf, _ring, _rpos, status = jax.lax.while_loop(cond, body, init)
    if use_first_correct:
        ok = status == ACCEPT
    else:
        ok = status == RUN  # completed max_steps without branch/revisit
    return ok, status == CAP, buf, n, wk


def make_graph_attempt(probe, codes, length, k: int):
    """Graph strategy (graph.rs:44-85)."""

    def attempt(i, kmer):
        err_len, fc, _found = _error_len_walk(probe, codes, length, k, i, kmer)
        nalts, corr = _alt_info(probe, kmer)
        alt_code = corr & _u(3)
        ok_w, cap, buf, n, wk = _unique_path_walk(
            probe, k, corr, alt_code, fc, True, jnp.int32(MAX_WALK),
            nalts == 1)
        ok = (nalts == 1) & ok_w
        return AttemptOut(ok, wk, err_len + 1, buf, n, (nalts == 1) & cap)

    return attempt


def make_gap_attempt(probe, codes, length, k: int, c: int):
    """GapSize dispatch (gap_size.rs:92-108): error_len <k -> Graph,
    ==k -> One, >k -> fixed-length unique-path fill."""
    one = make_one_attempt(probe, codes, length, k, c)

    def attempt(i, kmer):
        err_len, fc, _found = _error_len_walk(probe, codes, length, k, i, kmer)
        nalts, corr = _alt_info(probe, kmer)
        alt_code = corr & _u(3)

        is_graph = err_len < k
        gap = jnp.maximum(err_len - k, 0)
        is_one = err_len == k
        is_fill = err_len > k
        ok_w, cap, buf, n, wk = _unique_path_walk(
            probe, k, corr, alt_code, fc, True, jnp.int32(MAX_WALK),
            is_graph & (nalts == 1))
        ok_f, cap_f, buf_f, n_f, wk_f = _unique_path_walk(
            probe, k, corr, alt_code, fc, False, gap,
            is_fill & (nalts == 1))
        o = one(i, kmer)

        ok = jnp.where(is_graph, (nalts == 1) & ok_w,
                       jnp.where(is_one, o.ok, (nalts == 1) & ok_f))
        cap_hit = jnp.where(is_graph, (nalts == 1) & cap,
                            jnp.where(is_fill, (nalts == 1) & cap_f, False))
        new_kmer = jnp.where(is_graph, wk, jnp.where(is_one, o.new_kmer, wk_f))
        consumed = jnp.where(is_graph, err_len + 1,
                             jnp.where(is_one, o.consumed, n_f))
        cnt = jnp.where(is_graph, n, jnp.where(is_one, o.cnt, n_f))
        emit = jnp.where(is_graph, buf,
                         jnp.where(is_one,
                                   jnp.zeros_like(buf).at[0].set(o.emit[0]),
                                   buf_f))
        return AttemptOut(ok, new_kmer, consumed, emit, cnt, cap_hit)

    return attempt


def make_greedy_attempt(probe, codes, length, k: int, ms: int, nb: int,
                        ascii_arr=None):
    """Greedy strategy (greedy.rs:129-173): speculative unique-path walk up
    to ``ms`` steps, accepted via a rust-bio-compatible global alignment
    (see br_tpu.correct.alignment for the tie-break contract) plus
    ``nb``-k-mer confirmation.

    The alignment compares RAW BYTES like rust-bio (greedy.rs:63-65): the
    read window contributes its original ascii bytes (``ascii_arr``), the
    k-1 prefix and the candidate path contribute decoded uppercase ACTG.
    For pure-uppercase-ACGT input the 2-bit codes are equivalent, so when
    ``ascii_arr`` is None the code domain is used (legacy behavior).

    TPU shape: the walk is unrolled (ms is small and static); ONE Gotoh DP
    is filled by anti-diagonal wavefront over the maximal window (every
    iteration's alignment is a prefix-pair of it), then all ms tracebacks
    run in lockstep; acceptance stats are computed vectorized over the ops
    sequences."""
    if ms + 1 > 62:
        raise ValueError("greedy max_search > 61 unsupported on device")

    Lr = (k - 1) + (ms - 1)   # before + longest read window
    Lc = (k - 1) + (ms + 1)   # before + longest path
    W = Lr + 1                # wavefront width (rows r = 0..Lr)
    ND = Lr + Lc + 1          # number of anti-diagonals
    T = Lr + Lc               # max traceback length
    GO = -1
    GE = -1
    OE = GO + GE

    def attempt(i, kmer):
        rem = length - i
        nalts, corr = _alt_info(probe, kmer)

        # -- before_seq: the k-1 bases of kmer>>2 (greedy.rs:139-141) ------
        pre = kmer >> _u(2)
        before = [((pre >> _u(2 * (k - 2 - t))) & _u(3)).astype(jnp.uint8)
                  for t in range(k - 1)]

        # -- speculative walk, unrolled; fail_step = first branch/revisit --
        wks = [corr]
        path = [(corr & _u(3)).astype(jnp.uint8)]
        fail_step = jnp.int32(ms)  # ms = never fails within the walk
        for s in range(ms):
            cands = jnp.stack([add_nuc(wks[s], jnp.uint8(a), k)
                               for a in range(4)])
            okv = probe(cands)
            ns = jnp.sum(okv.astype(I32))
            sa = jnp.sum(jnp.arange(4, dtype=U64) * okv.astype(U64))
            nxt = add_nuc(wks[s], sa.astype(jnp.uint8), k)
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

        # -- r/c arrays for the maximal alignment window -------------------
        if ascii_arr is None:
            r_full = jnp.stack(before + [
                _code_at(codes, i + t) for t in range(ms - 1)])
            c_full = jnp.stack(before + path)
        else:
            # byte domain (exact vs rust-bio for arbitrary input bytes)
            before_b = [dc.decode_codes(b) for b in before]
            r_full = jnp.stack(before_b + [
                _code_at(ascii_arr, i + t) for t in range(ms - 1)])
            c_full = jnp.stack(before_b + [dc.decode_codes(p)
                                           for p in path])

        # -- Gotoh DP by wavefront; traceback layers stored per diagonal ---
        rows = jnp.arange(W, dtype=I32)

        def shift1(v, fill):
            return jnp.concatenate([jnp.full((1,), fill, v.dtype), v[:-1]])

        def diag_step(d, carry):
            Sp, Ip, Dp, sbp, Sp2, tb_s, tb_i, tb_d = carry
            j = d - rows
            inb = (j >= 0) & (j <= Lc)

            # gap-in-y layer (consumes x; vertical) from (r-1, j) on d-1
            i_ext = shift1(Ip, NEG_INF) + GE
            i_opn = shift1(Sp, NEG_INF) + OE
            I_d = jnp.maximum(i_ext, i_opn)
            ib_d = jnp.where(i_ext > i_opn, jnp.int8(OP_INS),
                             shift1(sbp, jnp.int8(TB_START)))

            # gap-in-x layer (consumes y; horizontal) from (r, j-1) on d-1
            d_ext = Dp + GE
            d_opn = Sp + OE
            D_d = jnp.maximum(d_ext, d_opn)
            db_d = jnp.where(d_ext > d_opn, jnp.int8(OP_DEL), sbp)

            # match/subst from (r-1, j-1) on d-2
            xr = r_full[jnp.clip(rows - 1, 0, Lr - 1)]
            yc = c_full[jnp.clip(j - 1, 0, Lc - 1)]
            msc = jnp.where(xr == yc, 1, -1)
            mbit = jnp.where(xr == yc, jnp.int8(OP_MATCH), jnp.int8(OP_SUBST))
            m_val = shift1(Sp2, NEG_INF) + msc

            S_d = m_val
            sb_d = mbit
            S_d, sb_d = (jnp.maximum(S_d, I_d),
                         jnp.where(I_d > S_d, jnp.int8(OP_INS), sb_d))
            S_d2, sb_d2 = (jnp.maximum(S_d, D_d),
                           jnp.where(D_d > S_d, jnp.int8(OP_DEL), sb_d))
            S_d, sb_d = S_d2, sb_d2

            # borders: r==0 row (j=d) and j==0 column (r=d)
            is_r0 = rows == 0
            is_j0 = j == 0
            border_rj = GO + GE * jnp.maximum(d, 1)
            S_d = jnp.where(is_r0 | is_j0, border_rj, S_d)
            I_d = jnp.where(is_r0, NEG_INF, jnp.where(is_j0, border_rj, I_d))
            D_d = jnp.where(is_j0, NEG_INF, jnp.where(is_r0, border_rj, D_d))
            sb_d = jnp.where(is_r0, jnp.int8(OP_DEL),
                             jnp.where(is_j0, jnp.int8(OP_INS), sb_d))
            ib_d = jnp.where(is_j0,
                             jnp.where(rows > 1, jnp.int8(OP_INS),
                                       jnp.int8(TB_START)), ib_d)
            db_d = jnp.where(is_r0,
                             jnp.where(j > 1, jnp.int8(OP_DEL),
                                       jnp.int8(TB_START)), db_d)
            # origin
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

        # -- all ms tracebacks in lockstep ---------------------------------
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

        # -- match_alignement stats (greedy.rs:67-88), vectorized ----------
        w = jnp.arange(T, dtype=I32)[None, :]           # forward op index
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
        # trailing indels: prefix of ops_rev that is all-indel
        rev_ind = (ops_rev == OP_INS) | (ops_rev == OP_DEL)
        rev_in = jnp.arange(T)[None, :] < nops[:, None]
        pref_ind = jnp.cumprod(rev_ind | ~rev_in, axis=1).astype(bool) & rev_in
        rev_contrib = jnp.where(ops_rev == OP_INS, 1,
                                jnp.where(ops_rev == OP_DEL, -1, 0))
        offset_corr = jnp.sum(rev_contrib * pref_ind, axis=1)
        off_align = offset - offset_corr

        # -- check_next_kmers (greedy.rs:104-117) per iteration ------------
        checks = []
        for it in range(ms):
            km = wks[it + 1]
            okc = (rem - it) >= nb
            for t in range(nb):
                km = add_nuc(km, _code_at(codes, i + it + t), k)
                okc = okc & probe(km)
            checks.append(okc)
        check = jnp.stack(checks)

        # -- first terminating event (accept or fail), rust order ----------
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
        # rust casts (len + off) as i64 -> usize; a negative value would wrap
        # and effectively rewind the scan.  We clamp and flag for oracle
        # fallback instead (never observed on real data).
        consumed = jnp.maximum(raw_consumed, 0)
        cap = ok & (raw_consumed < 0)

        new_kmer = jnp.zeros((), U64)
        for it in range(ms):
            new_kmer = jnp.where(sel[it], wks[it + 1], new_kmer)

        emit = jnp.zeros(2, dtype=U64)
        for t in range(ms + 1):
            word, sh = divmod(t, 31)
            emit = emit.at[word].set(
                emit[word] | jnp.where(t < cnt,
                                       path[t].astype(U64) << _u(2 * sh),
                                       _u(0)))
        return AttemptOut(ok, new_kmer, consumed, emit, cnt, cap)

    return attempt


# ---------------------------------------------------------------------------
# The per-strategy scan pass: two-level while_loop + edit list.
# ---------------------------------------------------------------------------

BIG = np.int32(1 << 30)


def _reverse_cummin(a):
    return jnp.flip(jax.lax.cummin(jnp.flip(a, -1), axis=a.ndim - 1), -1)


def make_pass_fn(k: int, strategy: str, c: int, ms: int, nb: int,
                 L: int, E: int, probe_kind: str):
    """Build the jittable single-strategy pass over a (B, L) bucket.

    Returns fn(table, ascii (B,L) u8, lens (B,) i32)
    -> (out_ascii (B,L) u8, out_lens (B,) i32, cap (B,) bool)."""

    W = _emit_words(strategy)

    def pass_lane(table, ascii_in, length):
        if probe_kind == "solid":
            probe = dc.make_solid_probe(table, k)
        else:
            probe = dc.make_hash_probe(table, k)

        codes = dc.encode_ascii(ascii_in)
        kmers_tab = dc.rolling_kmers(codes, k)
        pos = jnp.arange(L, dtype=I32)
        vmask = probe(kmers_tab) & (pos < length) & (pos >= k - 1)

        next_inv = jnp.minimum(
            _reverse_cummin(jnp.where(~vmask, pos, BIG)), length)
        next_val = jnp.minimum(
            _reverse_cummin(jnp.where(vmask, pos, BIG)), length)

        if strategy == "one":
            attempt = make_one_attempt(probe, codes, length, k, c)
        elif strategy == "two":
            attempt = make_two_attempt(probe, codes, length, k, c)
        elif strategy == "graph":
            attempt = make_graph_attempt(probe, codes, length, k)
        elif strategy == "gap-size":
            attempt = make_gap_attempt(probe, codes, length, k, c)
        elif strategy == "greedy":
            attempt = make_greedy_attempt(probe, codes, length, k, ms, nb,
                                          ascii_arr=ascii_in)
        else:
            raise ValueError(strategy)

        def absorb_at(km, idx):
            return add_nuc(km, _code_at(codes, idx), k)

        def probe_state(i, km, dirty):
            km1 = absorb_at(km, i)
            pure = dirty <= 0
            v1 = jnp.where(pure, vmask[jnp.clip(i, 0, L - 1)], probe(km1))
            return km1, v1

        def inner_cond(s):
            i, km, prev, dirty = s
            _km1, v1 = probe_state(i, km, dirty)
            return (i < length) & ~(prev & ~v1)

        def inner_body(s):
            i, km, prev, dirty = s
            km1, v1 = probe_state(i, km, dirty)
            pure = dirty <= 0

            # pure + previous-valid: jump over the whole valid run
            j_inv = jnp.minimum(next_inv[jnp.clip(i, 0, L - 1)], length)
            fv_i = j_inv
            fv_km = kmers_tab[jnp.clip(j_inv - 1, 0, L - 1)]

            # pure + previous-invalid: jump to the next valid position
            j_val = jnp.minimum(next_val[jnp.clip(i, 0, L - 1)], length)
            fi_i = jnp.minimum(j_val + 1, length)
            fi_km = kmers_tab[jnp.clip(j_val, 0, L - 1)]
            fi_prev = j_val < length

            fast_v = pure & prev & v1
            fast_i = pure & ~prev

            i2 = jnp.where(fast_v, fv_i, jnp.where(fast_i, fi_i, i + 1))
            km2 = jnp.where(fast_v, fv_km, jnp.where(fast_i, fi_km, km1))
            prev2 = jnp.where(fast_v, True, jnp.where(fast_i, fi_prev, v1))
            dirty2 = jnp.where(fast_v | fast_i, 0, jnp.maximum(dirty - 1, 0))
            return (i2, km2, prev2, dirty2)

        def outer_cond(st):
            return st[0] < length

        def outer_body(st):
            (i, km, prev, dirty, n_ed, ed_pos, ed_cnt, ed_skip, ed_word,
             cap) = st

            i, km, prev, dirty = jax.lax.while_loop(
                inner_cond, inner_body, (i, km, prev, dirty))

            at_attempt = i < length
            att_km = absorb_at(km, i)
            res = attempt(i, att_km)
            applied = at_attempt & res.ok
            consumed = res.consumed.astype(I32)
            cnt = res.cnt.astype(I32)

            # record 0 carries the consumed-skip; continuation records (and
            # unused trailing slots) sit at the resume position with zero
            # verbatim span, so segment lengths stay non-negative.
            wv = jnp.arange(W, dtype=I32)
            rec_pos = jnp.where(wv == 0, i, i + consumed).astype(I32)
            rec_cnt = jnp.clip(cnt - 31 * wv, 0, 31).astype(I32)
            rec_skip = jnp.where(wv == 0, consumed, 0).astype(I32)

            ed_pos = jax.lax.dynamic_update_slice(ed_pos, rec_pos, (n_ed,))
            ed_cnt = jax.lax.dynamic_update_slice(ed_cnt, rec_cnt, (n_ed,))
            ed_skip = jax.lax.dynamic_update_slice(ed_skip, rec_skip, (n_ed,))
            ed_word = jax.lax.dynamic_update_slice(ed_word, res.emit, (n_ed,))

            n_ed2 = jnp.where(applied, n_ed + W, n_ed)
            cap2 = cap | (at_attempt & res.cap) | (applied & (n_ed + W > E - W))

            i2 = jnp.where(applied, i + consumed,
                           jnp.where(at_attempt, i + 1, i)).astype(I32)
            km2 = jnp.where(applied, res.new_kmer,
                            jnp.where(at_attempt, att_km, km))
            prev2 = jnp.where(applied, True, False)
            dirty2 = jnp.where(applied, jnp.int32(k),
                               jnp.where(at_attempt,
                                         jnp.maximum(dirty - 1, 0), dirty))
            return (i2, km2, prev2, dirty2, n_ed2, ed_pos, ed_cnt, ed_skip,
                    ed_word, cap2)

        short = length < k
        i0 = jnp.where(short, length, jnp.int32(k))
        km0 = kmers_tab[jnp.clip(k - 1, 0, L - 1)]
        prev0 = vmask[jnp.clip(k - 1, 0, L - 1)]
        st0 = (i0, km0, prev0, jnp.int32(0), jnp.int32(0),
               jnp.zeros(E, I32), jnp.zeros(E, I32), jnp.zeros(E, I32),
               jnp.zeros(E, U64), jnp.bool_(False))
        st = jax.lax.while_loop(outer_cond, outer_body, st0)
        (_i, _km, _prev, _dirty, n_ed, ed_pos, ed_cnt, ed_skip, ed_word,
         cap) = st

        # ------------------ vectorized splice assembly --------------------
        r = jnp.arange(E, dtype=I32)
        used = r < n_ed
        pos_m = jnp.where(used, ed_pos, length)
        cnt_m = jnp.where(used, ed_cnt, 0)
        skip_m = jnp.where(used, ed_skip, 0)

        cursor = jnp.concatenate(
            [jnp.zeros(1, I32), pos_m + skip_m])        # (E+1,)
        v_len = pos_m - cursor[:-1]
        seg_len = jnp.stack([v_len, cnt_m], 1).reshape(-1)  # 2E interleaved
        starts = jnp.concatenate(
            [jnp.zeros(1, I32), jnp.cumsum(seg_len)])   # (2E+1,)
        body_len = starts[-1]
        out_len = body_len + (length - cursor[-1])

        o = jnp.arange(L, dtype=I32)
        seg = jnp.clip(
            jnp.searchsorted(starts, o, side="right") - 1, 0, 2 * E)
        in_tail = o >= body_len
        rr = jnp.clip(seg // 2, 0, E - 1)
        within = jnp.where(in_tail, o - body_len, o - starts[seg])
        is_emit = ((seg & 1) == 1) & ~in_tail
        src = jnp.where(in_tail, cursor[-1] + within, cursor[rr] + within)
        emit_code = ((ed_word[rr] >> (2 * within).astype(U64)) & _u(3))
        out = jnp.where(
            is_emit,
            dc.decode_codes(emit_code.astype(jnp.uint8)),
            ascii_in[jnp.clip(src, 0, L - 1)])
        out = jnp.where(o < out_len, out, jnp.uint8(0))

        cap = cap | (out_len > L)
        return out, out_len, cap

    batched = jax.vmap(pass_lane, in_axes=(None, 0, 0))
    return jax.jit(batched)


# ---------------------------------------------------------------------------
# Batch driver: bucketing, pass chaining, reverse pass, oracle fallback.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=())
def _reverse_batch(ascii_in, lens):
    L = ascii_in.shape[-1]
    o = jnp.arange(L, dtype=I32)
    idx = jnp.clip(lens[:, None] - 1 - o[None, :], 0, L - 1)
    rev = jnp.take_along_axis(ascii_in, idx, axis=1)
    return jnp.where(o[None, :] < lens[:, None], rev, jnp.uint8(0))


def _bucket_len(n: int) -> int:
    """Geometric buckets to bound pad waste and compile count."""
    b = 256
    while b < n:
        b *= 2
    return b


class TpuCorrector:
    """Batched device corrector with oracle fallback for capped reads.

    The method chain and the reverse pass mirror run_correction
    (src/lib.rs:93-132); every pass is one compiled program per
    (strategy, bucket) pair, reused across batches and directions.
    """

    #: per-bucket lane count targets (B*L ~ 2^21 keeps buffers modest
    #: while filling the VPU)
    TARGET_ELEMS = 1 << 21

    def __init__(self, valid_kmer, corrections, confirm: int, max_search: int):
        from br_tpu.set.hash import HashSet
        from br_tpu.set.solid import SolidSet

        self.k = valid_kmer.k
        self.c = confirm
        self.ms = max_search
        self.corrections = [c.lower().replace("_", "-") for c in corrections]
        self.valid_kmer = valid_kmer
        if isinstance(valid_kmer, SolidSet):
            self.probe_kind = "solid"
            self.table = jax.device_put(valid_kmer.device_words())
        elif isinstance(valid_kmer, HashSet):
            self.probe_kind = "hash"
            self.table = jax.device_put(valid_kmer.device_table())
        else:
            raise TypeError("valid_kmer must be SolidSet or HashSet")
        self._pass_cache: dict = {}
        self._oracle = None
        #: optional jax.sharding.Mesh with a "dp" axis; when set, batches
        #: shard along B and the bitfield is replicated per chip.
        self.mesh = None

    # -- compiled pass lookup ----------------------------------------------

    def _get_pass(self, strategy: str, L: int, E: int):
        key = (strategy, L, E)
        fn = self._pass_cache.get(key)
        if fn is None:
            fn = make_pass_fn(self.k, strategy, self.c, self.ms, self.c,
                              L, E, self.probe_kind)
            self._pass_cache[key] = fn
        return fn

    # -- the public batch interface ----------------------------------------

    def correct_batch(self, seqs, two_side: bool):
        out = [None] * len(seqs)
        order = np.argsort([len(s) for s in seqs], kind="stable")
        groups: dict[int, list[int]] = {}
        for idx in order:
            groups.setdefault(_bucket_len(len(seqs[idx]) + 8), []).append(idx)

        for bucket, idxs in groups.items():
            # slack for net insertions; overflow raises cap -> oracle
            L = bucket + max(64, bucket // 8)
            B_target = max(8, self.TARGET_ELEMS // L)
            for lo in range(0, len(idxs), B_target):
                chunk = idxs[lo : lo + B_target]
                res = self._correct_chunk([seqs[i] for i in chunk], L,
                                          two_side)
                for i, seq in zip(chunk, res):
                    out[i] = seq
        return out

    def _correct_chunk(self, seqs, L: int, two_side: bool):
        B = len(seqs)
        if self.mesh is not None:
            D = self.mesh.size
            B = -(-B // D) * D  # pad lanes to a mesh multiple; len-0 lanes
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

        W_map = {s: _emit_words(s) for s in self.corrections}
        E_for = {s: max(W_map[s] * (L // 4 + 16), 64) for s in self.corrections}

        def run_chain(a, n, cap_any):
            for strat in self.corrections:
                fn = self._get_pass(strat, L, E_for[strat])
                a, n, cap = fn(self.table, a, n)
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
        for b, s in enumerate(seqs):
            if cap_np[b]:
                results.append(self._oracle_correct(s, two_side))
            else:
                results.append(a_np[b, : n_np[b]].tobytes())
        return results

    def _oracle_correct(self, seq: bytes, two_side: bool):
        """Exact re-correction of a capped read.

        Prefers the native CPU engine (bit-exact, fast); falls back to the
        scalar Python oracle if the extension cannot build."""
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
        return self._oracle.correct_batch([seq], two_side)[0]
