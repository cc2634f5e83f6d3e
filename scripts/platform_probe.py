#!/usr/bin/env python
"""Probe the target chip's effective HBM bandwidth and per-fusion overhead.

Times (R-scaled, carry-dependent so nothing hoists):
  copy N MB        -> effective read+write bandwidth
  k tiny ops       -> fixed cost per fused op inside one jit program
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp


def timed(fn, carry, r1=4, r2=16):
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


def main():
    # 1) bandwidth: x = x + 1 over various sizes (1 read + 1 write)
    for mb in (8, 64, 256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.zeros((n,), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        t = timed(f, x)
        bw = 2 * mb / 1024 / t
        print(f"  add1 {mb:5d} MB: {t*1e6:9.1f} us  -> {bw:7.1f} GB/s (r+w)")

    # 2) per-op overhead: chain of k dependent tiny ops on a (2048,) vector
    for k in (16, 64, 256):
        x = jnp.zeros((2048,), jnp.float32)

        def chain(x, k=k):
            for i in range(k):
                x = x * 1.000001 + 1.0
                x = jnp.roll(x, 1)  # blocks fusion into one op
            return x

        f = jax.jit(chain)
        t = timed(f, x)
        print(f"  chain k={k:4d}: {t*1e6:9.1f} us  -> {t/k*1e6:6.2f} us/op-pair")

    # 3) scatter row-write cost vs operand size (expand-style)
    B, A = 2048, 162
    for N in (26, 101, 401):
        x = jnp.zeros((B, N, A), jnp.bfloat16)
        idx = jnp.arange(B) % N
        row = jnp.ones((B, A), jnp.bfloat16)

        def scat(x):
            return x.at[jnp.arange(B), idx].set(row + x[:, 0])
        f = jax.jit(scat)
        t = timed(f, x)
        mb = B * N * A * 2 / 1e6
        print(f"  row-scatter (B,{N},A) [{mb:6.1f} MB]: {t*1e6:9.1f} us")

    # 4) gather+argmax full pass (PUCT-style) vs N
    for N in (26, 101, 401):
        pr = jnp.zeros((B, N, A), jnp.bfloat16)
        nsa = jnp.zeros((B, N, A), jnp.uint8)
        qsa = jnp.zeros((B, N, A), jnp.bfloat16)
        ch = jnp.zeros((B, N, A), jnp.int8)

        def puct(pr, nsa=nsa, qsa=qsa, ch=ch):
            u = qsa.astype(jnp.float32) + 1.25 * pr.astype(jnp.float32) / (
                1 + nsa.astype(jnp.float32))
            best = jnp.argmax(u, -1).astype(jnp.int32)
            code = jnp.take_along_axis(ch, best[..., None], 2)[..., 0]
            return pr + code[..., None].astype(jnp.bfloat16) * 1e-9
        f = jax.jit(puct)
        t = timed(f, pr)
        mb = B * N * A * 6 / 1e6
        print(f"  puct pass  (B,{N},A) [{mb:6.1f} MB rd]: {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()
