#!/usr/bin/env python
"""Minimal-repro bisect for the long-scan TPU worker fault.

Round-2 finding (docs/tpu_limits.md): a self-play scan over many move slots
of some game engines kills the TPU worker (process dies, no Python
exception), e.g. splendor at >= 48 moves, while santorini at 128 moves is
fine.  This harness probes `run_selfplay` at increasing scan lengths in a
SUBPROCESS per probe (a fault kills the child, not the driver), reporting
the largest passing and smallest failing length per game — the measured
thresholds feed GameSpec.safe_scan_moves / the Coach auto-chunk fallback.

Run on the real chip with nothing else using the TPU:
    python scripts/tpu_scan_bisect.py splendor --lo 8 --hi 64
"""
import argparse
import json
import subprocess
import sys
import textwrap

PROBE = textwrap.dedent("""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax
    from alphazero_tpu.config import MCTSConfig, SelfPlayConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.config import NetConfig
    from alphazero_tpu.selfplay.actor import run_selfplay

    game, variant_json, moves, batch, sims = sys.argv[1:6]
    import json as _json
    spec = make_game(game, **_json.loads(variant_json))
    net = make_net(spec, NetConfig(version=1, channels=32, depth=2))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    batch_, stats = run_selfplay(
        spec, net, params, jax.random.PRNGKey(1),
        mc=MCTSConfig(num_sims=int(sims)), sp=SelfPlayConfig(
            batch_size=int(batch)),
        num_moves=int(moves), batch_size=int(batch))
    jax.block_until_ready(batch_.state)
    print("PROBE_OK", int(stats.episodes_done))
""")


def probe(game, variant, moves, batch, sims, timeout):
    r = subprocess.run(
        [sys.executable, "-c", PROBE, game, json.dumps(variant), str(moves),
         str(batch), str(sims)],
        capture_output=True, text=True, timeout=timeout)
    ok = r.returncode == 0 and "PROBE_OK" in r.stdout
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    return ok, tail


def main():
    p = argparse.ArgumentParser()
    p.add_argument("game")
    p.add_argument("--variant", default="{}")
    p.add_argument("--lo", type=int, default=8,
                   help="known-good scan length to start from")
    p.add_argument("--hi", type=int, default=0,
                   help="upper bound (0 = the game's max_game_length)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--sims", type=int, default=24)
    p.add_argument("--timeout", type=int, default=900)
    args = p.parse_args()

    sys.path.insert(0, "/root/repo")
    from alphazero_tpu.games import make_game
    variant = json.loads(args.variant)
    hi = args.hi or make_game(args.game, **variant).max_game_length

    lo = args.lo
    ok, tail = probe(args.game, variant, lo, args.batch, args.sims,
                     args.timeout)
    print(f"{args.game} moves={lo}: {'ok' if ok else 'FAULT'} {tail}",
          flush=True)
    if not ok:
        print(json.dumps(dict(game=args.game, first_fault=lo,
                              last_ok=None)))
        return
    fail = None
    ok_hi = lo
    # exponential climb then binary search
    m = lo
    while m < hi:
        m = min(hi, m * 2)
        ok, tail = probe(args.game, variant, m, args.batch, args.sims,
                         args.timeout)
        print(f"{args.game} moves={m}: {'ok' if ok else 'FAULT'} {tail}",
              flush=True)
        if ok:
            ok_hi = m
            if m == hi:
                break
        else:
            fail = m
            break
    while fail is not None and fail - ok_hi > 4:
        mid = (fail + ok_hi) // 2
        ok, tail = probe(args.game, variant, mid, args.batch, args.sims,
                         args.timeout)
        print(f"{args.game} moves={mid}: {'ok' if ok else 'FAULT'} {tail}",
              flush=True)
        if ok:
            ok_hi = mid
        else:
            fail = mid
    print(json.dumps(dict(game=args.game, variant=variant, batch=args.batch,
                          sims=args.sims, last_ok=ok_hi, first_fault=fail)))


if __name__ == "__main__":
    main()
