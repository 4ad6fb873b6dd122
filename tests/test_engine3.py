"""Differential tests: the v3 (flat-packed) engine vs the scalar oracle.

Same ground rules as test_engine2.py: the oracle (br_tpu.correct.reference)
is the spec; engine3 must match byte-for-byte, falling back through its
cap flags where engineered bounds bite (the fallback path itself goes
through the oracle, so any mismatch here is a real engine bug).

The full-chain reverse-pass fuzz runs in the DEFAULT tier so a semantics
drift in the flagship engine fails `pytest -q` (VERDICT r2 item 4); it
exercises all five strategy programs plus the reversal program.
"""

import numpy as np
import pytest

from br_tpu.correct import build_methods, correct_read
from br_tpu.correct.engine3 import Tpu3Corrector
from br_tpu.set.solid import SolidSet

K = 13
FULL = ["one", "two", "graph", "greedy", "gap-size"]


_RC = bytes.maketrans(b"ACGT", b"TGCA")


def _repeat_rich_genome(rng, size=4000):
    """A genome with tandem and inverted repeats.

    Uniform-random genomes have essentially no repeated k-mers, so the
    de Bruijn walks never branch and every strategy resolves trivially —
    exactly the regime where the round-3 fused-ladder regression passed
    fuzz but broke on the real corpus.  Tandem units (period > k) and a
    reverse-complement block (canonical-set collisions) create the branch
    ambiguity that distinguishes execution plans (VERDICT r3 item 7)."""
    bases = np.frombuffer(b"ACTG", np.uint8)
    core = rng.choice(bases, size=size).tobytes()
    unit = rng.choice(bases, size=K + 8).tobytes()      # tandem, period > k
    rc_block = core[500:1200][::-1].translate(_RC)       # inverted repeat
    g = (core[:800] + unit * 6 + core[800:2000] + rc_block
         + core[2000:2600] + unit * 4 + core[2600:])
    return g


def _fuzz_case(chain, seed, n_reads=16, err=3, two_side=True,
               impure=False, fused=None, genome=None,
               cluster_gap=None):
    rng = np.random.default_rng(seed)
    if genome is None:
        genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                            size=4000).tobytes()
    solid = SolidSet.from_sequences([genome], K)
    reads = []
    for _ in range(n_reads):
        lo = rng.integers(0, len(genome) - 420)
        ln = int(rng.integers(2 * K + 10, 400))
        r = bytearray(genome[lo : lo + ln])

        def plant(p):
            op = rng.integers(3)
            if op == 0:
                r[p] = ord("ACTG"[rng.integers(4)])
            elif op == 1 and len(r) > 2 * K + 8:
                del r[p]
            else:
                r.insert(p, ord("ACTG"[rng.integers(4)]))

        if cluster_gap is not None:
            # pairs of errors a fixed distance apart (e.g. just over k),
            # so one repair's confirmation window can reach the next
            # error site (ADVICE r3 item 3)
            for _ in range(err):
                p = int(rng.integers(K + 2, len(r) - K - 2 - cluster_gap))
                plant(p + cluster_gap)
                plant(p)
        else:
            for _ in range(err):
                plant(int(rng.integers(K + 2, len(r) - K - 2)))
        reads.append(bytes(r))
    if impure:
        # lowercase + N bytes must route to the host oracle verbatim
        r = bytearray(reads[0])
        r[len(r) // 2] = ord("n")
        r[len(r) // 3] = ord("a")
        reads[0] = bytes(r)

    tc = Tpu3Corrector(solid, chain, confirm=5, max_search=7,
                       chunk=1 << 14, nreads=32, fused=fused)
    got = tc.correct_batch(reads, two_side)
    methods = build_methods(chain, solid, 5, 7)
    want = [correct_read(r, methods, two_side) for r in reads]
    assert got == want


def test_v3_full_chain_reverse_pass():
    """Default-tier flagship coverage: the per-strategy pass cascade
    (the production path — reference semantics, lib.rs:106-108) +
    reverse pass."""
    _fuzz_case(FULL, seed=9, err=6, two_side=False)


def test_v3_ladder_optin_on_sparse_errors():
    """The experimental fused ladder (opt-in via fused=True) still
    matches the oracle when errors are sparse enough that per-site
    resolution and the pass cascade agree.  NOT the production path."""
    _fuzz_case(FULL, seed=9, err=6, two_side=False, fused=True)


def test_v3_impure_reads_route_to_oracle():
    _fuzz_case(FULL, seed=5, err=4, two_side=False, impure=True)


# default tier (VERDICT r2 item 4): the pass programs were already
# compiled by the full-chain test above (process-wide _FN_CACHE), so the
# per-strategy differentials only cost their run time.
@pytest.mark.parametrize("chain", [["one"], ["two"], ["graph"],
                                   ["greedy"], ["gap-size"]])
def test_v3_single_strategies(chain):
    _fuzz_case(chain, seed=42)


def test_v3_repeat_rich_genome():
    """DEFAULT tier: production path on a tandem/inverted-repeat genome —
    the input class where the round-3 regression hid from uniform fuzz.
    Same engine config as the other default-tier cases (shared compile)."""
    rng = np.random.default_rng(123)
    g = _repeat_rich_genome(rng)
    _fuzz_case(FULL, seed=123, err=5, two_side=False, genome=g)


def test_v3_repeat_rich_clustered_errors():
    """DEFAULT tier: error pairs planted k+1 apart on the repeat-rich
    genome, so repair confirmation windows span the next error site
    (ADVICE r3 item 3's distinguishing regime) — production cascade vs
    oracle."""
    rng = np.random.default_rng(321)
    g = _repeat_rich_genome(rng)
    _fuzz_case(FULL, seed=321, err=2, two_side=False, genome=g,
               cluster_gap=K + 1)


def test_v3_long_walk_declines_on_device():
    """Tier-3 (Brent) walk: a chimeric read makes Graph walk the donor
    genome's unique path for ~1500 steps before declining — far past
    WALK_MAX.  Pre-tier-3 this capped the read to the host (70% of the
    corpus fell back, BENCH r4); now the decline resolves on device and
    the result still matches the oracle bit for bit."""
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACTG", np.uint8)
    gA = rng.choice(bases, size=2400).tobytes()
    gB = rng.choice(bases, size=2400).tobytes()
    solid = SolidSet.from_sequences([gA, gB], K)
    # chimeric junction: the scan leaves gA's k-mers, the walk chases
    # gA's path while first_correct lies on gB
    reads = [gA[100:600] + gB[700:1200],
             gA[50:1800] + gB[200:900]]
    for chain in (["graph"], ["gap-size"]):
        tc = Tpu3Corrector(solid, chain, 5, 7, chunk=1 << 14, nreads=32)
        got = tc.correct_batch(reads, two_side=True)
        methods = build_methods(chain, solid, 5, 7)
        want = [correct_read(r, methods, True) for r in reads]
        assert got == want, chain
        assert tc.last_stats["fallback"] == 0, (chain, tc.last_stats)


@pytest.mark.slow
def test_v3_dense_errors():
    _fuzz_case(FULL, seed=77, n_reads=24, err=10, two_side=False)


@pytest.mark.slow
def test_v3_repeat_rich_two_side():
    rng = np.random.default_rng(55)
    g = _repeat_rich_genome(rng, size=6000)
    _fuzz_case(FULL, seed=55, n_reads=24, err=6, two_side=True, genome=g)


@pytest.mark.slow
@pytest.mark.parametrize("confirm,max_search", [(9, 7), (14, 7), (5, 14)])
def test_v3_window_beyond_k(confirm, max_search):
    """ADVICE r3 item 3: confirmation / lookahead windows AT or BEYOND k
    (the regime where per-site and per-pass plans can diverge) — the
    production cascade must still match the oracle exactly."""
    rng = np.random.default_rng(confirm * 100 + max_search)
    g = _repeat_rich_genome(rng)
    reads = []
    for _ in range(12):
        lo = rng.integers(0, len(g) - 420)
        r = bytearray(g[lo : lo + 400])
        for _ in range(2):
            p = int(rng.integers(K + 2, len(r) - 2 * K - 4))
            r[p] = ord("ACTG"[rng.integers(4)])
            r[p + K + 1] = ord("ACTG"[rng.integers(4)])
        reads.append(bytes(r))
    solid = SolidSet.from_sequences([g], K)
    tc = Tpu3Corrector(solid, FULL, confirm=confirm, max_search=max_search,
                       chunk=1 << 14, nreads=32)
    got = tc.correct_batch(reads, two_side=False)
    methods = build_methods(FULL, solid, confirm, max_search)
    want = [correct_read(r, methods, False) for r in reads]
    assert got == want


@pytest.mark.slow
def test_v3_long_reads_multi_chunk():
    """Reads bigger than one chunk's read-slot budget span chunks."""
    rng = np.random.default_rng(3)
    genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=20000).tobytes()
    solid = SolidSet.from_sequences([genome], K)
    reads = []
    for _ in range(12):
        lo = rng.integers(0, 8000)
        ln = int(rng.integers(3000, 9000))
        r = bytearray(genome[lo : lo + ln])
        for _ in range(ln // 200):
            p = rng.integers(K + 2, len(r) - K - 2)
            r[p] = ord("ACTG"[rng.integers(4)])
        reads.append(bytes(r))
    tc = Tpu3Corrector(solid, FULL, confirm=5, max_search=7,
                       chunk=1 << 14, nreads=4)
    got = tc.correct_batch(reads, two_side=False)
    methods = build_methods(FULL, solid, 5, 7)
    want = [correct_read(r, methods, two_side=False) for r in reads]
    assert got == want


@pytest.mark.slow
def test_greedy_arr_matches_perlane():
    """The lane-last greedy attempt is bit-identical to the per-lane
    (vmapped) implementation on random sites.

    Slow tier: compiling the superseded per-lane (vmapped) variant costs
    ~200 s on CPU — 1/3 of the whole default suite — while the arr
    variant's semantics are already covered by the oracle differentials
    (test_v3_full_chain_reverse_pass and the greedy single-strategy
    case) in the default tier."""
    import jax

    from br_tpu.correct import device_codec as dc
    from br_tpu.correct.engine3 import (
        make_greedy_attempt32,
        make_greedy_attempt32_arr,
    )

    rng = np.random.default_rng(11)
    genome = rng.choice(np.frombuffer(b"ACTG", np.uint8),
                        size=3000).tobytes()
    solid = SolidSet.from_sequences([genome], K)
    import jax.numpy as jnp

    table = jnp.asarray(solid.device_words())
    probe = dc.make_solid_probe_any(table, K)
    codes = jnp.asarray((np.frombuffer(genome, np.uint8) >> 1) & 3)

    N = 64
    i = jnp.asarray(rng.integers(K, 2500, N).astype(np.int32))
    km = jnp.asarray(rng.integers(0, 1 << (2 * K), N).astype(np.uint32))
    ln = jnp.asarray(np.full(N, 2990, np.int32))

    per = jax.vmap(make_greedy_attempt32(probe, codes, K, 7, 5))(i, km, ln)
    arr = make_greedy_attempt32_arr(probe, codes, K, 7, 5)(i, km, ln)
    for a, b, name in zip(per, arr, per._fields):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_v3_long_walk_accept_via_wide_retry():
    """VERDICT r4 item 4: a true ACCEPT past WALK_MAX (the default
    profile's emit buffer) must stay on device.  A 400-base deletion
    makes Graph walk the unique genome path for ~400 steps to
    first_correct; the default profile CAPs (t_wk == t_fc guard), the
    wide-profile retry resolves it, and the result matches the oracle
    with zero host fallback."""
    rng = np.random.default_rng(1234)
    bases = np.frombuffer(b"ACTG", np.uint8)
    gA = rng.choice(bases, size=2400).tobytes()
    solid = SolidSet.from_sequences([gA], K)
    reads = [gA[:500] + gA[900:1500]]       # 400-base deletion junction
    tc = Tpu3Corrector(solid, ["graph"], 5, 7, chunk=1 << 14, nreads=8)
    got = tc.correct_batch(reads, two_side=True)
    methods = build_methods(["graph"], solid, 5, 7)
    want = [correct_read(r, methods, True) for r in reads]
    assert got == want
    assert want[0] != reads[0], "walk should have repaired the deletion"
    assert tc.last_stats["fallback"] == 0, tc.last_stats
    assert tc.last_stats["wide_retried"] >= 1, tc.last_stats


def test_v3_long_gap_fill_via_wide_retry():
    """Gap fills longer than the default emit buffer (the second r4 cap
    class): a ~400-base invalid region dispatches GapSize into fill
    mode with gap > WALK_MAX; the wide retry completes it on device."""
    rng = np.random.default_rng(4321)
    bases = np.frombuffer(b"ACTG", np.uint8)
    gA = rng.choice(bases, size=3000).tobytes()
    solid = SolidSet.from_sequences([gA], K)
    garbage = rng.choice(bases, size=400).tobytes()
    reads = [gA[:600] + garbage + gA[600 + 400:1800]]
    tc = Tpu3Corrector(solid, ["gap-size"], 5, 7, chunk=1 << 14, nreads=8)
    got = tc.correct_batch(reads, two_side=True)
    methods = build_methods(["gap-size"], solid, 5, 7)
    want = [correct_read(r, methods, True) for r in reads]
    assert got == want
    assert tc.last_stats["fallback"] == 0, tc.last_stats


def test_v3_reference_catalog():
    """The reference's full planted-error catalog (one.rs/two.rs/
    graph.rs/greedy.rs/gap_size.rs unit tests, tests/catalog.py) through
    the v3 engine — including the zero-emit DCI record whose segment
    boundaries collide in the delta-fill splice.  fallback must stay 0
    so the DEVICE (not the host oracle) produced every answer."""
    from catalog import (CASES, NO_REFE_CHECK, build_case_set,
                         build_oracle_corrector, filt)

    by_cfg = {}
    for case in CASES:
        (name, method, kwargs, k, refe, read, extra, expect) = case
        by_cfg.setdefault((method, k, tuple(sorted(kwargs.items()))),
                          []).append(case)
    for (_m, _k, _kw), group in by_cfg.items():
        for (name, method, kwargs, k, refe, read, extra, expect) in group:
            refe_f, read_f = filt(refe), filt(read)
            s = build_case_set(k, refe_f, extra)
            oracle = build_oracle_corrector(method, kwargs, s)
            inputs = [read_f] + ([] if name in NO_REFE_CHECK else [refe_f])
            want = [oracle.correct(x) for x in inputs]
            c = kwargs.get("c", kwargs.get("nb_validate", 2))
            ms = kwargs.get("max_search", 7)
            tc = Tpu3Corrector(s, [method], confirm=c, max_search=ms,
                               chunk=1 << 12, nreads=8)
            got = tc.correct_batch(inputs, two_side=True)
            assert got == want, f"{name}: v3 diverges from oracle"
            assert tc.last_stats["fallback"] == 0, (name, tc.last_stats)


def test_v3_validity_carry_chain_matches_plain():
    """Incremental-validity capability (OFF by default — measured slower
    on the current stack, see make_pass3_fn): an emit_dirty producer
    followed by a carry consumer must equal the plain dense-probing
    chain bit for bit, including the in-graph dense fallback on list
    overflow."""
    import jax

    from br_tpu.correct.engine3 import make_pass3_fn

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACTG", np.uint8)
    genome = rng.choice(bases, 3000).tobytes()
    solid = SolidSet.from_sequences([genome], K)
    CHUNK, R = 1 << 13, 16
    codes = np.zeros(CHUNK, np.uint8)
    rstart = np.full(R, CHUNK, np.int32)
    rlen = np.zeros(R, np.int32)
    off = 0
    for b in range(6):
        lo = int(rng.integers(0, 2300))
        read = bytearray(genome[lo : lo + 600])
        for _ in range(4):
            p = int(rng.integers(K + 2, len(read) - K - 2))
            op = int(rng.integers(3))
            if op == 0:
                read[p] = int(rng.choice(bases))
            elif op == 1:
                del read[p]
            else:
                read.insert(p, int(rng.choice(bases)))
        arr = np.frombuffer(bytes(read), np.uint8)
        codes[off : off + len(arr)] = (arr >> 1) & 3
        rstart[b] = off
        rlen[b] = len(arr)
        off += 768
    table = jax.device_put(solid.device_words())

    def chain(carry_mode):
        a = jax.numpy.asarray(codes)
        n = jax.numpy.asarray(rlen)
        rs = jax.numpy.asarray(rstart)
        if carry_mode:
            f1 = make_pass3_fn(K, "one", 5, 7, 5, CHUNK, R,
                               emit_dirty=True)
            f2 = make_pass3_fn(K, "two", 5, 7, 5, CHUNK, R, carry=True)
            a, n, cap1, _x, dl, dcn = f1(table, a, rs, n)
            a, n, cap2, _x, _dl, _dc = f2(table, a, rs, n, dl, dcn)
        else:
            f1 = make_pass3_fn(K, "one", 5, 7, 5, CHUNK, R)
            f2 = make_pass3_fn(K, "two", 5, 7, 5, CHUNK, R)
            a, n, cap1, _x, _dl, _dc = f1(table, a, rs, n)
            a, n, cap2, _x, _dl2, _dc2 = f2(table, a, rs, n)
        return (np.asarray(a) & 3, np.asarray(n),
                np.asarray(cap1 | cap2))

    a1, n1, c1 = chain(False)
    a2, n2, c2 = chain(True)
    assert np.array_equal(n1, n2) and np.array_equal(c1, c2)
    # compare only within out_len (beyond is stale garbage by design)
    for b in range(6):
        lo, ln = rstart[b], n1[b]
        assert np.array_equal(a1[lo : lo + ln], a2[lo : lo + ln]), b
