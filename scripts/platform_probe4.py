#!/usr/bin/env python
"""Probe 4: same comparisons as probe 3, but each candidate runs as a
length-K lax.scan inside ONE jitted dispatch — dispatch noise amortizes to
zero and carries prevent folding."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, N, A, S = 2048, 101, 162, 50
K = 100


def timed(body, carry):
    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, i: (body(c, i), None), carry,
                            jnp.arange(K, dtype=jnp.int32))[0]

    jax.block_until_ready(run(carry))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def main():
    key = jax.random.PRNGKey(0)
    ch = jax.random.randint(key, (B, N, A), -5, 100, jnp.int32).astype(jnp.int8)
    best0 = jax.random.randint(key, (B, N), 0, A, jnp.int32)
    idx0 = jax.random.randint(key, (B,), 0, N, jnp.int32)
    act0 = jax.random.randint(key, (B,), 0, A, jnp.int32)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (B, N, A), 2)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    # A. children code select from (B,N,A) int8 by (B,N) best
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
    print(f"  A1 code take_along_axis : {timed(a1, c0)*1e6:9.1f} us")
    print(f"  A2 code masked-reduce   : {timed(a2, c0)*1e6:9.1f} us")

    # B. walk row gather (B,N,3) by (B,)
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
    print(f"  B1 row take_along_axis  : {timed(b1, cb)*1e6:9.1f} us")
    print(f"  B2 row masked-reduce    : {timed(b2, cb)*1e6:9.1f} us")

    # C. state row gather (B,N,S) int8 by (B,)
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
    print(f"  C1 state adv-index      : {timed(c1, cb)*1e6:9.1f} us")
    print(f"  C2 state masked-reduce  : {timed(c2, cb)*1e6:9.1f} us")

    # D. expand row scatter vs where-blend, bf16 (B,N,A) carried
    pr0 = jnp.zeros((B, N, A), jnp.bfloat16)
    row = jnp.ones((B, A), jnp.bfloat16)
    def d1(pr, i):
        ix = (idx0 + i) % N
        return pr.at[jnp.arange(B), ix].set(row + pr[:, 0] * 1e-9, mode="drop")
    def d2(pr, i):
        ix = (idx0 + i) % N
        sel = (iota_n == ix[:, None])[..., None]
        return jnp.where(sel, (row + pr[:, 0] * 1e-9)[:, None, :], pr)
    print(f"  D1 row scatter bf16     : {timed(d1, pr0)*1e6:9.1f} us")
    print(f"  D2 row where-blend bf16 : {timed(d2, pr0)*1e6:9.1f} us")

    # E. edge scalar scatter int8 (B,N,A) carried
    def e1(chi, i):
        ix = (idx0 + i) % N
        return chi.at[jnp.arange(B), ix, act0].set(jnp.int8(7), mode="drop")
    def e2(chi, i):
        ix = (idx0 + i) % N
        sel = (iota_n == ix[:, None])[..., None] & (iota_a == act0[:, None, None])
        return jnp.where(sel, jnp.int8(7), chi)
    print(f"  E1 edge scatter int8    : {timed(e1, ch)*1e6:9.1f} us")
    print(f"  E2 edge where-blend int8: {timed(e2, ch)*1e6:9.1f} us")

    # F. full puct pass on real dtypes (bf16 prior/qsa, u8 nsa) + code
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
    print(f"  F1 puct+code gather     : {timed(f1, c0)*1e6:9.1f} us")
    print(f"  F2 puct+code masked-red : {timed(f2, c0)*1e6:9.1f} us")


if __name__ == "__main__":
    main()
