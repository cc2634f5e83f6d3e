#!/usr/bin/env python
"""Benchmark: self-play MCTS throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference achieves ~3000 MCTS rollouts/s on one CPU core with
NN inference >70% of runtime (BASELINE.md; /root/reference/README_features.md:2-3)
— and the SAME ~3000/s for every game (README_features.md:2).  So the default
output carries two rows: the santorini flagship (headline `value`) and
splendor (`extra.splendor`), the chance-heavy engine that stresses the
program-size limits (docs/tpu_limits.md).  Each row also reports MFU.

MFU model (round-5 fix): XLA's cost_analysis counts every loop body ONCE
regardless of trip count (verified: lowering the self-play program at
num_moves=2 vs 1 and sims=16 vs 8 yields identical FLOPs), so costing the
whole lowered program understates FLOPs by the sims x moves trip counts.
Instead we lower ONE loop-free net forward at the bench batch (counted
correctly), divide by the batch for a per-leaf-eval cost, and multiply by
the MEASURED evaluation count (sims_total + moves_total root evals) — the
same net-only numerator as the reference's fvcore count
(GenericNNetWrapper.py:389-397).  Tree walk/backup passes are elementwise
(negligible FLOPs, all bandwidth), so this numerator is the honest MXU
work; the denominator is wall time x chip bf16 peak.
"""

import argparse
import json
import time

# bf16 peak FLOP/s by device_kind prefix (public TPU specs)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p (after the more specific v5 lite)
    "TPU v6 lite": 918e12,   # v6e (Trillium)
}


def peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for prefix, peak in PEAK_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return 0.0


def _note(msg):
    import sys
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def bench_game(game, variant, *, B, sims, moves, ch, depth, tree_dtype,
               max_depth, reps, platform, no_dyn=False):
    import jax

    from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.selfplay.actor import (run_selfplay,
                                              run_selfplay_chunked)

    spec = make_game(game, **variant)
    net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    # scan-fault engines at sims<=safe_scan_sims take the dynamic path —
    # the production stage-1 shape (scripts/splendor_recipe_r4.sh): one
    # un-unrollable move+sim body, measured 244.6k sims/s vs the chunked
    # path's per-chunk dispatch (docs/tpu_limits.md round-4 addendum)
    dyn = (not no_dyn and platform != "cpu" and spec.safe_scan_moves
           and spec.safe_scan_moves < moves
           and (not spec.safe_scan_sims or sims <= spec.safe_scan_sims))
    # dyn_stages=4: the round-5 width-staging lever (bit-exact,
    # tests/test_selfplay.py::test_dyn_staged_bitexact).  Attribution at
    # this shape (runs/perf_attr_r5.log, committed in STRENGTH_r05.md):
    # dense tree passes + game kernels are ~92% of per-sim cost and scale
    # with arena width; staging cuts mean width to ~63% of full.
    mc = MCTSConfig(num_sims=sims, ratio_full=4, prob_full=0.25,
                    forced_playouts=True, max_depth=max_depth,
                    q_dtype=tree_dtype, prior_dtype=tree_dtype,
                    dyn_sims=bool(dyn), dyn_stages=(4 if dyn else 1))
    sp = SelfPlayConfig(batch_size=B, dyn=bool(dyn), pcr_split=not dyn)

    # production program shape: scan-fault engines chunk on TPU exactly as
    # the Coach does (train/coach.py self_play; docs/tpu_limits.md)
    chunk = 0
    if not dyn and platform != "cpu" and spec.safe_scan_moves \
            and spec.safe_scan_moves < moves:
        chunk = spec.safe_scan_moves
        if spec.safe_scan_sims and sims > spec.safe_scan_sims:
            chunk = 1

    if dyn:
        from alphazero_tpu.selfplay.actor import run_selfplay_dyn

        def run(key):
            batch, stats = run_selfplay_dyn(
                spec, net, params, key, moves * B, mc=mc, sp=sp,
                num_moves=moves, batch_size=B)
            jax.block_until_ready(batch.state)
            return stats

    elif chunk:
        def run(key):
            batch, stats = run_selfplay_chunked(
                spec, net, params, key, mc=mc, sp=sp, num_moves=moves,
                chunk_moves=chunk, batch_size=B)
            jax.block_until_ready(batch.state)
            return stats

    else:
        def run(key):
            batch, stats = run_selfplay(spec, net, params, key, mc=mc,
                                        sp=sp, num_moves=moves, batch_size=B)
            jax.block_until_ready(batch.state)
            return stats

    # MFU numerator: per-leaf-eval net FLOPs (see module docstring) from a
    # loop-free lowering, counted on whichever backend reports a cost
    # analysis (the axon TPU plugin reports none -> CPU subprocess; FLOP
    # counts are platform-independent, tracing only, no compile)
    flops_per_eval = 0.0
    try:
        lowered = jax.jit(net.apply).lower(
            params, jax.numpy.zeros((B, *spec.obs_shape), jax.numpy.float32),
            jax.numpy.ones((B, spec.num_actions), bool))
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops_per_eval = float(ca.get("flops", 0.0)) / B
    except Exception:                                    # backend-dependent
        flops_per_eval = 0.0
    if not flops_per_eval and platform != "cpu":
        _note(f"{game}: net-flops probe (CPU subprocess)")
        flops_per_eval = _flops_probe(
            game=game, variant=variant, B=B, ch=ch, depth=depth) / B

    _note(f"{game}: compiling (B={B}, sims={sims}, dyn={bool(dyn)}, chunk={chunk})")
    run(jax.random.PRNGKey(0))    # warmup (compile)
    _note(f"{game}: compiled; running {reps} reps")
    t0 = time.perf_counter()
    sims_total = 0
    moves_total = 0
    for r in range(reps):
        stats = run(jax.random.PRNGKey(r + 1))
        sims_total += int(stats.sims)
        moves_total += int(stats.moves)
    dt = time.perf_counter() - t0

    # every counted sim ends in one leaf net eval; every move adds one root
    # eval.  (PCR fast lanes are already reflected in the measured counts.)
    flops_per_s = flops_per_eval * (sims_total + moves_total) / dt
    peak = peak_flops(jax.devices()[0])
    row = {
        "game": spec.name,
        "sims_per_s": round(sims_total / dt, 1),
        "env_steps_per_s": round(moves_total / dt, 1),
        # reference: ~3000 rollouts/s on one i5 core (README_features.md:2)
        "vs_baseline": round(sims_total / dt / 3000.0, 2),
        "batch": B,
        "num_sims": sims,
        "chunk_moves": chunk,
        "net": f"{type(net).__name__}_{ch}x{depth}",
        "tflops_per_s": round(flops_per_s / 1e12, 3),
        "mfu": round(flops_per_s / peak, 4) if peak else None,
        "wall_s": round(dt, 2),
    }
    return row


def _flops_probe(**kw) -> float:
    """XLA FLOPs of ONE net forward at the bench batch, lowered on CPU in
    a subprocess (loop-free, so cost_analysis counts it correctly).

    Cross-checked against the analytic dense-net estimate 2*params*B: the
    XLA count additionally includes the mixer's token-mix matmuls at their
    true cost and the masked-softmax head, and agrees within ~2x."""
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--flops-probe", json.dumps(kw)],
            capture_output=True, text=True, timeout=600)
        return float(json.loads(out.stdout.strip().splitlines()[-1])["flops"])
    except Exception:
        return 0.0


def _flops_probe_main(kw):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.config import NetConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net

    spec = make_game(kw["game"], **kw["variant"])
    net = make_net(spec, NetConfig(version=1, channels=kw["ch"],
                                   depth=kw["depth"]))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    lowered = jax.jit(net.apply).lower(
        params, jnp.zeros((kw["B"], *spec.obs_shape), jnp.float32),
        jnp.ones((kw["B"], spec.num_actions), bool))
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(json.dumps({"flops": float(ca.get("flops", 0.0))}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flops-probe", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--game", default=None,
                    help="bench ONE registry game instead of the default "
                    "santorini+splendor pair")
    ap.add_argument("--variant", default=None,
                    help='game variant JSON (default: flagship variant)')
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for CI smoke")
    ap.add_argument("--batch", type=int, default=0,
                    help="parallel games (0 = auto)")
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--moves", type=int, default=16)
    # None sentinels so an EXPLICIT --channels 128 is distinguishable from
    # the default (kw_for only rewrites splendor's net when neither flag
    # was given)
    ap.add_argument("--channels", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--no-dyn", action="store_true",
                    help="force the scan/chunk path even where the dyn "
                    "path is probed safe (escape hatch for unprobed "
                    "(batch, net) shapes)")
    ap.add_argument("--max-depth", type=int, default=0,
                    help="tree descent depth cap (0 = unbounded/exact); "
                    "capped revisits back up the node's stored Q")
    ap.add_argument("--tree-dtype", default="bfloat16",
                    help="tree prior/q storage dtype (bfloat16 halves the "
                    "dense per-sim passes; float32 matches the parity-test "
                    "configuration bit-for-bit)")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    args = ap.parse_args()

    if args.flops_probe:
        _flops_probe_main(json.loads(args.flops_probe))
        return

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from alphazero_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    platform = jax.devices()[0].platform
    net_explicit = args.channels is not None or args.depth is not None
    if args.quick:
        B, sims, moves, ch, depth, reps = 32, 16, 4, 32, 2, 1
    else:
        B = args.batch or (4096 if platform != "cpu" else 64)
        sims, moves, reps = args.sims, args.moves, 3
        ch = args.channels if args.channels is not None else 128
        depth = args.depth if args.depth is not None else 6

    def variant_for(game):
        if args.variant is not None:
            return json.loads(args.variant)
        if game == "santorini":
            return dict(nb_gods=1, init_method=1)
        return {}

    kw = dict(sims=sims, moves=moves, ch=ch, depth=depth,
              tree_dtype=args.tree_dtype, max_depth=args.max_depth,
              reps=reps, platform=platform, no_dyn=args.no_dyn)

    if args.game:
        games = [args.game]
    elif args.quick:
        games = ["santorini"]
    else:
        # default: flagship headline + the chance-heavy stress engine, so
        # the committed number never hides the slowest game
        games = ["santorini", "splendor"]

    def kw_for(g):
        k = dict(kw)
        if g == "splendor" and not net_explicit and not args.quick:
            # production splendor net (scripts/splendor_recipe_r4.sh): the
            # 64x4 mixer analog of the reference checkpoint's V80 — and the
            # exact shape the dyn-path fault boundary was probed at
            # (docs/tpu_limits.md round-4 addendum); bigger nets at this
            # arena width are unprobed on the worker
            k.update(ch=64, depth=4)
        return k

    rows = [bench_game(g, variant_for(g),
                       B=(B if g == "santorini" else min(B, 2048)),
                       **kw_for(g))
            for g in games]

    head = rows[0]
    result = {
        "metric": "selfplay_mcts_sims_per_s",
        "value": head["sims_per_s"],
        "unit": "sims/s",
        "vs_baseline": head["vs_baseline"],
        "extra": {"platform": platform, **head},
    }
    for row in rows[1:]:
        result["extra"][row["game"]] = row
    print(json.dumps(result))


if __name__ == "__main__":
    main()
