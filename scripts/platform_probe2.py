#!/usr/bin/env python
"""Second probe: separate elementwise / reduce / gather / convert costs on
the (B, N, A) shapes the MCTS engine actually uses."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, N, A = 2048, 101, 162


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
    a, b = run(r1), run(r2)
    return (b - a) / (r2 - r1)


def report(name, t, mb):
    print(f"  {name:44s} {t*1e6:9.1f} us  {mb/t/1e3:8.1f} GB/s")


def main():
    f32 = jnp.ones((B, N, A), jnp.float32)
    bf = jnp.ones((B, N, A), jnp.bfloat16)
    u8 = jnp.ones((B, N, A), jnp.uint8)
    i8 = jnp.ones((B, N, A), jnp.int8)
    bn = jnp.ones((B, N), jnp.float32)

    mb_f32 = B * N * A * 4 / 1e6
    mb_bf = mb_f32 / 2
    mb_u8 = mb_f32 / 4

    report("f32 x*1.01+c (r+w)", timed(lambda x: x * 1.01 + 3.0, f32),
           2 * mb_f32)
    report("bf16 x*1.01+c (r+w)", timed(lambda x: x * 1.01 + 3.0, bf),
           2 * mb_bf)
    report("u8 x+1 (r+w)", timed(lambda x: x + 1, u8), 2 * mb_u8)
    report("bf16 read -> f32 sum over A (r)",
           timed(lambda x: x + jnp.sum(bf.astype(jnp.float32), -1,
                                       keepdims=True) * 1e-9, bn[..., None] * jnp.ones((1, 1, 1))),
           mb_bf)
    report("f32 argmax over A (r)",
           timed(lambda c, x: c + jnp.argmax(x + c[..., None] * 1e-9,
                                             -1).astype(jnp.float32),
                 bn, f32), mb_f32)
    best = jnp.zeros((B, N), jnp.int32)
    report("take_along_axis A (i8, r-ish)",
           timed(lambda c, x: c + jnp.take_along_axis(
               x, (c.astype(jnp.int32) % A)[..., None], 2)[..., 0
               ].astype(jnp.float32), bn, i8), mb_u8)
    # full puct-shaped fused pass, f32 everything
    def puctf(c, pr, nsa, qsa):
        u = qsa + 1.25 * pr / (1 + nsa) + c[..., None] * 1e-9
        return c + jnp.argmax(u, -1).astype(jnp.float32)
    report("puct f32(pr,nsa,qsa)+argmax (3 rd)",
           timed(puctf, bn, f32, f32 + 1, f32 + 2), 3 * mb_f32)
    def puctb(c, pr, nsa, qsa):
        u = (qsa.astype(jnp.float32) + 1.25 * pr.astype(jnp.float32)
             / (1 + nsa.astype(jnp.float32)) + c[..., None] * 1e-9)
        return c + jnp.argmax(u, -1).astype(jnp.float32)
    report("puct bf16/u8/bf16+argmax (2.5B/el rd)",
           timed(puctb, bn, bf, u8, bf + 1), 2.5 * mb_u8)
    # A padded to 128 vs 162 vs 256
    for Ax in (128, 162, 256):
        x = jnp.ones((B, N, Ax), jnp.float32)
        t = timed(lambda c, x: c + jnp.argmax(x + c[..., None] * 1e-9, -1
                                              ).astype(jnp.float32), bn, x)
        report(f"argmax f32 A={Ax} (r)", t, B * N * Ax * 4 / 1e6)


if __name__ == "__main__":
    main()
