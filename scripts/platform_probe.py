#!/usr/bin/env python
"""Chip micro-probes behind one CLI (rounds 2-3 shipped these as four
separate scripts; consolidated per round-3 housekeeping).

Suites (pick with --suite, default runs all):
  bandwidth  effective HBM bandwidth + per-fused-op overhead + scatter/puct
             pass costs vs node-arena width
  dtypes     elementwise / reduce / gather / convert costs per dtype on the
             (B, N, A) shapes the MCTS engine actually uses
  lowerings  gather/scatter lowerings vs arithmetic alternatives (masked
             reduce, one-hot dot, where-blend), one dispatch per rep
  scanned    the same comparisons run as a length-K lax.scan inside ONE
             dispatch — dispatch noise amortizes to zero

All timings are carry-dependent so nothing constant-folds or hoists.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, N, A, S = 2048, 101, 162, 50


def timed_carry(fn, carry, r1=4, r2=16):
    """Time fn-chained-on-its-own-output; (run(r2)-run(r1))/(r2-r1) cancels
    the dispatch ramp."""
    def run(r):
        c = carry
        t0 = time.perf_counter()
        for _ in range(r):
            c = fn(c)
        jax.block_until_ready(c)
        return time.perf_counter() - t0

    run(r1)
    run(r2)
    a, b = run(r1), run(r2)
    return (b - a) / (r2 - r1)


def timed_args(fn, *arrs, r1=8, r2=24, best_of=1):
    f = jax.jit(fn)

    def run(r):
        c = arrs[0]
        t0 = time.perf_counter()
        for _ in range(r):
            c = f(c, *arrs[1:])
        jax.block_until_ready(c)
        return time.perf_counter() - t0

    run(r1); run(r2)
    ts = []
    for _ in range(best_of):
        a, b = run(r1), run(r2)
        ts.append((b - a) / (r2 - r1))
    return min(ts)


def timed_scan(body, carry, k=100, reps=5):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, i: (body(c, i), None), carry,
                            jnp.arange(k, dtype=jnp.int32))[0]

    jax.block_until_ready(run(carry))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry))
        ts.append(time.perf_counter() - t0)
    return min(ts) / k


# --------------------------------------------------------------------------
def suite_bandwidth():
    print("== bandwidth / per-op overhead / arena-width passes ==")
    for mb in (8, 64, 256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.zeros((n,), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        t = timed_carry(f, x)
        bw = 2 * mb / 1024 / t
        print(f"  add1 {mb:5d} MB: {t*1e6:9.1f} us  -> {bw:7.1f} GB/s (r+w)")

    for k in (16, 64, 256):
        x = jnp.zeros((2048,), jnp.float32)

        def chain(x, k=k):
            for i in range(k):
                x = x * 1.000001 + 1.0
                x = jnp.roll(x, 1)  # blocks fusion into one op
            return x

        t = timed_carry(jax.jit(chain), x)
        print(f"  chain k={k:4d}: {t*1e6:9.1f} us  -> {t/k*1e6:6.2f} us/op-pair")

    for n in (26, 101, 401):
        x = jnp.zeros((B, n, A), jnp.bfloat16)
        idx = jnp.arange(B) % n
        row = jnp.ones((B, A), jnp.bfloat16)

        def scat(x):
            return x.at[jnp.arange(B), idx].set(row + x[:, 0])
        t = timed_carry(jax.jit(scat), x)
        mb = B * n * A * 2 / 1e6
        print(f"  row-scatter (B,{n},A) [{mb:6.1f} MB]: {t*1e6:9.1f} us")

    for n in (26, 101, 401):
        pr = jnp.zeros((B, n, A), jnp.bfloat16)
        nsa = jnp.zeros((B, n, A), jnp.uint8)
        qsa = jnp.zeros((B, n, A), jnp.bfloat16)
        ch = jnp.zeros((B, n, A), jnp.int8)

        def puct(pr, nsa=nsa, qsa=qsa, ch=ch):
            u = qsa.astype(jnp.float32) + 1.25 * pr.astype(jnp.float32) / (
                1 + nsa.astype(jnp.float32))
            best = jnp.argmax(u, -1).astype(jnp.int32)
            code = jnp.take_along_axis(ch, best[..., None], 2)[..., 0]
            return pr + code[..., None].astype(jnp.bfloat16) * 1e-9
        t = timed_carry(jax.jit(puct), pr)
        mb = B * n * A * 6 / 1e6
        print(f"  puct pass  (B,{n},A) [{mb:6.1f} MB rd]: {t*1e6:9.1f} us")


# --------------------------------------------------------------------------
def suite_dtypes():
    print("== per-dtype elementwise / reduce / gather on (B,N,A) ==")

    def report(name, t, mb):
        print(f"  {name:44s} {t*1e6:9.1f} us  {mb/t/1e3:8.1f} GB/s")

    f32 = jnp.ones((B, N, A), jnp.float32)
    bf = jnp.ones((B, N, A), jnp.bfloat16)
    u8 = jnp.ones((B, N, A), jnp.uint8)
    i8 = jnp.ones((B, N, A), jnp.int8)
    bn = jnp.ones((B, N), jnp.float32)

    mb_f32 = B * N * A * 4 / 1e6
    mb_bf = mb_f32 / 2
    mb_u8 = mb_f32 / 4

    report("f32 x*1.01+c (r+w)",
           timed_args(lambda x: x * 1.01 + 3.0, f32), 2 * mb_f32)
    report("bf16 x*1.01+c (r+w)",
           timed_args(lambda x: x * 1.01 + 3.0, bf), 2 * mb_bf)
    report("u8 x+1 (r+w)", timed_args(lambda x: x + 1, u8), 2 * mb_u8)
    report("bf16 read -> f32 sum over A (r)",
           timed_args(lambda x: x + jnp.sum(bf.astype(jnp.float32), -1,
                                            keepdims=True) * 1e-9,
                      bn[..., None] * jnp.ones((1, 1, 1))), mb_bf)
    report("f32 argmax over A (r)",
           timed_args(lambda c, x: c + jnp.argmax(x + c[..., None] * 1e-9,
                                                  -1).astype(jnp.float32),
                      bn, f32), mb_f32)
    report("take_along_axis A (i8, r-ish)",
           timed_args(lambda c, x: c + jnp.take_along_axis(
               x, (c.astype(jnp.int32) % A)[..., None], 2)[..., 0
               ].astype(jnp.float32), bn, i8), mb_u8)

    def puctf(c, pr, nsa, qsa):
        u = qsa + 1.25 * pr / (1 + nsa) + c[..., None] * 1e-9
        return c + jnp.argmax(u, -1).astype(jnp.float32)
    report("puct f32(pr,nsa,qsa)+argmax (3 rd)",
           timed_args(puctf, bn, f32, f32 + 1, f32 + 2), 3 * mb_f32)

    def puctb(c, pr, nsa, qsa):
        u = (qsa.astype(jnp.float32) + 1.25 * pr.astype(jnp.float32)
             / (1 + nsa.astype(jnp.float32)) + c[..., None] * 1e-9)
        return c + jnp.argmax(u, -1).astype(jnp.float32)
    report("puct bf16/u8/bf16+argmax (2.5B/el rd)",
           timed_args(puctb, bn, bf, u8, bf + 1), 2.5 * mb_u8)
    for ax in (128, 162, 256):
        x = jnp.ones((B, N, ax), jnp.float32)
        t = timed_args(lambda c, x: c + jnp.argmax(
            x + c[..., None] * 1e-9, -1).astype(jnp.float32), bn, x)
        report(f"argmax f32 A={ax} (r)", t, B * N * ax * 4 / 1e6)


# --------------------------------------------------------------------------
def _fixtures():
    key = jax.random.PRNGKey(0)
    return dict(
        ch=jax.random.randint(key, (B, N, A), -5, 100,
                              jnp.int32).astype(jnp.int8),
        best=jax.random.randint(key, (B, N), 0, A, jnp.int32),
        idx=jax.random.randint(key, (B,), 0, N, jnp.int32),
        act=jax.random.randint(key, (B,), 0, A, jnp.int32),
        iota_a=jax.lax.broadcasted_iota(jnp.int32, (B, N, A), 2),
        iota_n=jax.lax.broadcasted_iota(jnp.int32, (B, N), 1),
    )


def suite_lowerings():
    print("== gather/scatter lowerings vs arithmetic alternatives ==")
    fx = _fixtures()
    ch, best, idx, act = fx["ch"], fx["best"], fx["idx"], fx["act"]
    iota_a, iota_n = fx["iota_a"], fx["iota_n"]
    bo = dict(best_of=3)

    def g_a(c, ch, best):
        b2 = (best + c[:, :1].astype(jnp.int32)) % A
        code = jnp.take_along_axis(ch, b2[..., None], 2)[..., 0]
        return c + code.astype(jnp.float32) * 1e-9

    def m_a(c, ch, best):
        b2 = (best + c[:, :1].astype(jnp.int32)) % A
        sel = iota_a == b2[..., None]
        code = jnp.sum(jnp.where(sel, ch.astype(jnp.int32), 0), -1)
        return c + code.astype(jnp.float32) * 1e-9

    def d_a(c, ch, best):
        b2 = (best + c[:, :1].astype(jnp.int32)) % A
        oh = jax.nn.one_hot(b2, A, dtype=jnp.bfloat16)
        code = jnp.einsum('bna,bna->bn', oh, ch.astype(jnp.bfloat16))
        return c + code.astype(jnp.float32) * 1e-9

    bn = jnp.zeros((B, N), jnp.float32)
    print(f"  A1 code take_along_axis : {timed_args(g_a, bn, ch, best, **bo)*1e6:9.1f} us")
    print(f"  A2 code masked-reduce   : {timed_args(m_a, bn, ch, best, **bo)*1e6:9.1f} us")
    print(f"  A3 code one-hot dot bf16: {timed_args(d_a, bn, ch, best, **bo)*1e6:9.1f} us")

    packed = jnp.zeros((B, N, 3), jnp.int32)
    cb = jnp.zeros((B,), jnp.int32)

    def g_b(c, packed):
        i = (idx + c.astype(jnp.int32)) % N
        r = jnp.take_along_axis(packed, i[:, None, None], 1)[:, 0]
        return c + r[:, 0] * 0

    def m_b(c, packed):
        i = (idx + c.astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None]
        r = jnp.sum(jnp.where(sel, packed, 0), 1)
        return c + r[:, 0] * 0

    print(f"  B1 row take_along_axis  : {timed_args(g_b, cb, packed, **bo)*1e6:9.1f} us")
    print(f"  B2 row masked-reduce    : {timed_args(m_b, cb, packed, **bo)*1e6:9.1f} us")

    st = jnp.zeros((B, N, S), jnp.int8)

    def g_c(c, st):
        i = (idx + c.astype(jnp.int32)) % N
        r = st[jnp.arange(B), i]
        return c + r[:, 0].astype(jnp.int32) * 0

    def m_c(c, st):
        i = (idx + c.astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None]
        r = jnp.sum(jnp.where(sel, st.astype(jnp.int32), 0), 1)
        return c + r[:, 0] * 0

    print(f"  C1 state adv-index      : {timed_args(g_c, cb, st, **bo)*1e6:9.1f} us")
    print(f"  C2 state masked-reduce  : {timed_args(m_c, cb, st, **bo)*1e6:9.1f} us")

    pr = jnp.zeros((B, N, A), jnp.bfloat16)
    row = jnp.ones((B, A), jnp.bfloat16)

    def g_d(pr, row):
        i = (idx + pr[:, 0, 0].astype(jnp.int32)) % N
        return pr.at[jnp.arange(B), i].set(row + pr[:, 0] * 1e-9, mode="drop")

    def m_d(pr, row):
        i = (idx + pr[:, 0, 0].astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None]
        return jnp.where(sel, (row + pr[:, 0] * 1e-9)[:, None, :], pr)

    print(f"  D1 row scatter bf16     : {timed_args(g_d, pr, row, **bo)*1e6:9.1f} us")
    print(f"  D2 row where-blend bf16 : {timed_args(m_d, pr, row, **bo)*1e6:9.1f} us")

    def g_e(chi, best):
        i = (idx + chi[:, 0, 0].astype(jnp.int32)) % N
        return chi.at[jnp.arange(B), i, act].set(7, mode="drop")

    def m_e(chi, best):
        i = (idx + chi[:, 0, 0].astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None] & \
            (iota_a == act[:, None, None])
        return jnp.where(sel, jnp.int8(7), chi)

    print(f"  E1 edge scatter int8    : {timed_args(g_e, ch, best, **bo)*1e6:9.1f} us")
    print(f"  E2 edge where-blend int8: {timed_args(m_e, ch, best, **bo)*1e6:9.1f} us")


# --------------------------------------------------------------------------
def suite_scanned():
    print("== same lowerings, scanned inside ONE dispatch ==")
    fx = _fixtures()
    ch, best0, idx0, act0 = fx["ch"], fx["best"], fx["idx"], fx["act"]
    iota_a, iota_n = fx["iota_a"], fx["iota_n"]

    def a1(c, i):
        best = (best0 + i) % A
        code = jnp.take_along_axis(ch, best[..., None], 2)[..., 0]
        return c + code.astype(jnp.int32)

    def a2(c, i):
        best = (best0 + i) % A
        sel = iota_a == best[..., None]
        code = jnp.sum(jnp.where(sel, ch.astype(jnp.int32), 0), -1)
        return c + code

    c0 = jnp.zeros((B, N), jnp.int32)
    print(f"  A1 code take_along_axis : {timed_scan(a1, c0)*1e6:9.1f} us")
    print(f"  A2 code masked-reduce   : {timed_scan(a2, c0)*1e6:9.1f} us")

    packed = jnp.zeros((B, N, 3), jnp.int32)

    def b1(c, i):
        ix = (idx0 + c) % N
        r = jnp.take_along_axis(packed, ix[:, None, None], 1)[:, 0]
        return c + r[:, 0] + 1

    def b2(c, i):
        ix = (idx0 + c) % N
        sel = (iota_n == ix[:, None])[..., None]
        r = jnp.sum(jnp.where(sel, packed, 0), 1)
        return c + r[:, 0] + 1

    cb = jnp.zeros((B,), jnp.int32)
    print(f"  B1 row take_along_axis  : {timed_scan(b1, cb)*1e6:9.1f} us")
    print(f"  B2 row masked-reduce    : {timed_scan(b2, cb)*1e6:9.1f} us")

    st = jnp.zeros((B, N, S), jnp.int8)

    def c1(c, i):
        ix = (idx0 + c) % N
        r = st[jnp.arange(B), ix]
        return c + r[:, 0].astype(jnp.int32) + 1

    def c2(c, i):
        ix = (idx0 + c) % N
        sel = (iota_n == ix[:, None])[..., None]
        r = jnp.sum(jnp.where(sel, st.astype(jnp.int32), 0), 1)
        return c + r[:, 0] + 1

    print(f"  C1 state adv-index      : {timed_scan(c1, cb)*1e6:9.1f} us")
    print(f"  C2 state masked-reduce  : {timed_scan(c2, cb)*1e6:9.1f} us")

    pr0 = jnp.zeros((B, N, A), jnp.bfloat16)
    row = jnp.ones((B, A), jnp.bfloat16)

    def d1(pr, i):
        ix = (idx0 + i) % N
        return pr.at[jnp.arange(B), ix].set(row + pr[:, 0] * 1e-9,
                                            mode="drop")

    def d2(pr, i):
        ix = (idx0 + i) % N
        sel = (iota_n == ix[:, None])[..., None]
        return jnp.where(sel, (row + pr[:, 0] * 1e-9)[:, None, :], pr)

    print(f"  D1 row scatter bf16     : {timed_scan(d1, pr0)*1e6:9.1f} us")
    print(f"  D2 row where-blend bf16 : {timed_scan(d2, pr0)*1e6:9.1f} us")

    def e1(chi, i):
        ix = (idx0 + i) % N
        return chi.at[jnp.arange(B), ix, act0].set(jnp.int8(7), mode="drop")

    def e2(chi, i):
        ix = (idx0 + i) % N
        sel = (iota_n == ix[:, None])[..., None] & \
            (iota_a == act0[:, None, None])
        return jnp.where(sel, jnp.int8(7), chi)

    print(f"  E1 edge scatter int8    : {timed_scan(e1, ch)*1e6:9.1f} us")
    print(f"  E2 edge where-blend int8: {timed_scan(e2, ch)*1e6:9.1f} us")

    pr = jnp.ones((B, N, A), jnp.bfloat16)
    qsa = jnp.ones((B, N, A), jnp.bfloat16)
    nsa = jnp.ones((B, N, A), jnp.uint8)

    def f1(c, i):
        u = (qsa.astype(jnp.float32)
             + 1.25 * pr.astype(jnp.float32) / (1 + nsa.astype(jnp.float32))
             + c[..., None].astype(jnp.float32) * 1e-9)
        best = jnp.argmax(u, -1).astype(jnp.int32)
        code = jnp.take_along_axis(ch, best[..., None], 2)[..., 0]
        return c + code.astype(jnp.int32)

    def f2(c, i):
        u = (qsa.astype(jnp.float32)
             + 1.25 * pr.astype(jnp.float32) / (1 + nsa.astype(jnp.float32))
             + c[..., None].astype(jnp.float32) * 1e-9)
        best = jnp.argmax(u, -1).astype(jnp.int32)
        sel = iota_a == best[..., None]
        code = jnp.sum(jnp.where(sel, ch.astype(jnp.int32), 0), -1)
        return c + code

    print(f"  F1 puct+code gather     : {timed_scan(f1, c0)*1e6:9.1f} us")
    print(f"  F2 puct+code masked-red : {timed_scan(f2, c0)*1e6:9.1f} us")


SUITES = dict(bandwidth=suite_bandwidth, dtypes=suite_dtypes,
              lowerings=suite_lowerings, scanned=suite_scanned)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", choices=sorted(SUITES) + ["all"], default="all")
    args = p.parse_args()
    for name, fn in SUITES.items():
        if args.suite in ("all", name):
            fn()


if __name__ == "__main__":
    main()
