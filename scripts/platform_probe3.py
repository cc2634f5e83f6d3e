#!/usr/bin/env python
"""Probe 3: gather/scatter lowerings vs arithmetic alternatives, on the
engine's exact shapes.  Each timing uses a carry so nothing folds."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, N, A, S = 2048, 101, 162, 50


def timed(fn, *arrs, r1=8, r2=24):
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
    for _ in range(3):
        a, b = run(r1), run(r2)
        ts.append((b - a) / (r2 - r1))
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    ch = jax.random.randint(key, (B, N, A), -5, 100, jnp.int32).astype(jnp.int8)
    best = jax.random.randint(key, (B, N), 0, A, jnp.int32)
    bn = jnp.zeros((B, N), jnp.float32)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (B, N, A), 2)

    # A. children code select: gather vs masked-reduce
    def g_a(c, ch, best):
        b2 = (best + c[:, :1].astype(jnp.int32)) % A
        code = jnp.take_along_axis(ch, b2[..., None], 2)[..., 0]
        return c + code.astype(jnp.float32) * 1e-9
    print(f"  A1 code take_along_axis : {timed(g_a, best, ch, best)*1e6:9.1f} us")

    def m_a(c, ch, best):
        b2 = (best + c[:, :1].astype(jnp.int32)) % A
        sel = iota_a == b2[..., None]
        code = jnp.sum(jnp.where(sel, ch.astype(jnp.int32), 0), -1)
        return c + code.astype(jnp.float32) * 1e-9
    print(f"  A2 code masked-reduce   : {timed(m_a, best, ch, best)*1e6:9.1f} us")

    def d_a(c, ch, best):
        b2 = (best + c[:, :1].astype(jnp.int32)) % A
        oh = jax.nn.one_hot(b2, A, dtype=jnp.bfloat16)
        code = jnp.einsum('bna,bna->bn', oh, ch.astype(jnp.bfloat16))
        return c + code.astype(jnp.float32) * 1e-9
    print(f"  A3 code one-hot dot bf16: {timed(d_a, best, ch, best)*1e6:9.1f} us")

    # B. walk row gather over N: (B,N,3) by (B,) index
    packed = jnp.zeros((B, N, 3), jnp.int32)
    idx = jax.random.randint(key, (B,), 0, N, jnp.int32)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def g_b(c, packed):
        i = (idx + c.astype(jnp.int32)) % N
        r = jnp.take_along_axis(packed, i[:, None, None], 1)[:, 0]
        return c + r[:, 0] * 0
    cb = jnp.zeros((B,), jnp.int32)
    print(f"  B1 row take_along_axis  : {timed(g_b, cb, packed)*1e6:9.1f} us")

    def m_b(c, packed):
        i = (idx + c.astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None]
        r = jnp.sum(jnp.where(sel, packed, 0), 1)
        return c + r[:, 0] * 0
    print(f"  B2 row masked-reduce    : {timed(m_b, cb, packed)*1e6:9.1f} us")

    # C. state row gather (B,N,S) int8 by (B,) index
    st = jnp.zeros((B, N, S), jnp.int8)

    def g_c(c, st):
        i = (idx + c.astype(jnp.int32)) % N
        r = st[jnp.arange(B), i]
        return c + r[:, 0].astype(jnp.int32) * 0
    print(f"  C1 state adv-index      : {timed(g_c, cb, st)*1e6:9.1f} us")

    def m_c(c, st):
        i = (idx + c.astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None]
        r = jnp.sum(jnp.where(sel, st.astype(jnp.int32), 0), 1)
        return c + r[:, 0] * 0
    print(f"  C2 state masked-reduce  : {timed(m_c, cb, st)*1e6:9.1f} us")

    # D. expand row scatter vs where-blend, bf16 (B,N,A)
    pr = jnp.zeros((B, N, A), jnp.bfloat16)
    row = jnp.ones((B, A), jnp.bfloat16)

    def g_d(pr, row):
        i = (idx + pr[:, 0, 0].astype(jnp.int32)) % N
        return pr.at[jnp.arange(B), i].set(row + pr[:, 0] * 1e-9, mode="drop")
    print(f"  D1 row scatter bf16     : {timed(g_d, pr, row)*1e6:9.1f} us")

    def m_d(pr, row):
        i = (idx + pr[:, 0, 0].astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None]
        return jnp.where(sel, (row + pr[:, 0] * 1e-9)[:, None, :], pr)
    print(f"  D2 row where-blend bf16 : {timed(m_d, pr, row)*1e6:9.1f} us")

    # E. children edge scatter (B,) node + (B,) action -> scalar per lane
    chi = ch
    act = jax.random.randint(key, (B,), 0, A, jnp.int32)

    def g_e(chi, best):
        i = (idx + chi[:, 0, 0].astype(jnp.int32)) % N
        return chi.at[jnp.arange(B), i, act].set(7, mode="drop")
    print(f"  E1 edge scatter int8    : {timed(g_e, chi, best)*1e6:9.1f} us")

    def m_e(chi, best):
        i = (idx + chi[:, 0, 0].astype(jnp.int32)) % N
        sel = (iota_n == i[:, None])[..., None] & (iota_a == act[:, None, None])
        return jnp.where(sel, jnp.int8(7), chi)
    print(f"  E2 edge where-blend int8: {timed(m_e, chi, best)*1e6:9.1f} us")


if __name__ == "__main__":
    main()
