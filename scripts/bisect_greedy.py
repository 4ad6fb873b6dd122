"""Isolate the greedy attempt's cost (TPU, floor-subtracted): full
attempt vs walk+checks-only vs DP-only, vmapped over 2048 sites."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from br_tpu.correct import device_codec as dc
from br_tpu.correct.engine3 import make_greedy_attempt32, add_nuc32, _u, I32, U32

K, MS, NB = 13, 7, 5
CHUNK = 1 << 18
BLKN = 2048
N = 6


def run(fn, inputs):
    np.asarray(fn(*inputs[0])[0] if isinstance(fn(*inputs[0]), tuple)
               else fn(*inputs[0]))
    t0 = time.perf_counter()
    for x in inputs:
        o = fn(*x)
        np.asarray(o[0] if isinstance(o, tuple) else o)
    return (time.perf_counter() - t0) / len(inputs)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    table = jax.device_put(
        rng.integers(0, 1 << 32, 1 << (2 * K - 1 - 5), dtype=np.uint32))
    probe = dc.make_solid_probe_any(table, K)

    def fresh():
        codes = jax.device_put(
            rng.integers(0, 4, CHUNK, dtype=np.uint8))
        i = jax.device_put(
            rng.integers(K, CHUNK - 200, BLKN, dtype=np.int32))
        km = jax.device_put(
            rng.integers(0, 1 << (2 * K), BLKN, dtype=np.uint32))
        ln = jax.device_put(
            np.full(BLKN, CHUNK - 8, dtype=np.int32))
        return codes, i, km, ln

    ins = [fresh() for _ in range(N)]

    # floor
    @jax.jit
    def nop(codes, i, km, ln):
        return i[0]

    floor = run(nop, ins)
    print(f"floor: {floor*1000:.2f} ms", flush=True)

    # full greedy attempt (as used in the pass)
    def full(codes, i, km, ln):
        att = jax.vmap(make_greedy_attempt32(probe, codes, K, MS, NB))
        return att(i, km, ln)

    f = jax.jit(full)
    t0 = time.perf_counter()
    f.lower(*ins[0]).compile()
    print(f"full attempt compile {time.perf_counter()-t0:.1f}s; "
          f"run {max(run(f, ins)-floor,0)*1000:7.2f} ms", flush=True)

    # walk + checks only (no DP, no traceback)
    def walk_only(codes, i, km, ln):
        def one(i1, km1, ln1):
            def code_at(idx):
                return codes[jnp.clip(idx, 0, CHUNK - 1)]

            corr = (km1 >> _u(2)) << _u(2)
            wks = [corr]
            for s in range(MS):
                cands = jnp.stack([add_nuc32(wks[s], jnp.uint8(a), K)
                                   for a in range(4)])
                okv = probe(cands)
                sa = jnp.sum(jnp.arange(4, dtype=U32) * okv.astype(U32),
                             dtype=U32)
                wks.append(add_nuc32(wks[s], sa.astype(jnp.uint8), K))
            acc = jnp.uint32(0)
            for it in range(MS):
                kmx = wks[it + 1]
                for t in range(NB):
                    kmx = add_nuc32(kmx, code_at(i1 + it + t), K)
                    acc = acc ^ kmx + probe(kmx).astype(U32)
            return acc

        return jax.vmap(one)(i, km, ln)

    f = jax.jit(walk_only)
    t0 = time.perf_counter()
    f.lower(*ins[0]).compile()
    print(f"walk+checks   compile {time.perf_counter()-t0:.1f}s; "
          f"run {max(run(f, ins)-floor,0)*1000:7.2f} ms", flush=True)

    # DP-only: same shapes as the attempt's alignment, synthetic inputs
    Lr = (K - 1) + (MS - 1)
    Lc = (K - 1) + (MS + 1)
    W = Lr + 1
    ND = Lr + Lc + 1
    NEG = jnp.int32(-(1 << 20))

    def dp_only(codes, i, km, ln):
        def one(i1, km1, ln1):
            r_full = jnp.stack([((km1 >> _u(2 * (t % K))) & _u(3)
                                 ).astype(jnp.uint8) for t in range(Lr)])
            c_full = jnp.stack([((km1 >> _u(2 * ((t + 1) % K))) & _u(3)
                                 ).astype(jnp.uint8) for t in range(Lc)])
            rows = jnp.arange(W, dtype=I32)

            def shift1(v, fill):
                return jnp.concatenate(
                    [jnp.full((1,), fill, v.dtype), v[:-1]])

            def diag_step(d, carry):
                Sp, Ip, Dp, Sp2, tb = carry
                j = d - rows
                i_ext = shift1(Ip, NEG) - 1
                i_opn = shift1(Sp, NEG) - 2
                I_d = jnp.maximum(i_ext, i_opn)
                D_d = jnp.maximum(Dp - 1, Sp - 2)
                xr = r_full[jnp.clip(rows - 1, 0, Lr - 1)]
                yc = c_full[jnp.clip(j - 1, 0, Lc - 1)]
                m = shift1(Sp2, NEG) + jnp.where(xr == yc, 1, -1)
                S_d = jnp.maximum(m, jnp.maximum(I_d, D_d))
                tb = tb.at[d].set(
                    (S_d == m).astype(jnp.int8)
                    + 2 * (S_d == I_d).astype(jnp.int8))
                return (S_d, I_d, D_d, Sp, tb)

            neg = jnp.full(W, NEG, dtype=I32)
            tb0 = jnp.zeros((ND, W), dtype=jnp.int8)
            carry = (neg, neg, neg, neg, tb0)
            carry = jax.lax.fori_loop(0, ND, diag_step, carry)
            return carry[0][0].astype(U32) + carry[4][0, 0].astype(U32)

        return jax.vmap(one)(i, km, ln)

    f = jax.jit(dp_only)
    t0 = time.perf_counter()
    f.lower(*ins[0]).compile()
    print(f"DP(fori)      compile {time.perf_counter()-t0:.1f}s; "
          f"run {max(run(f, ins)-floor,0)*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
