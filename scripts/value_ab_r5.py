"""Round-5 value-head A/B (VERDICT r4 task 4): break the corr(v,z) plateau
with controlled experiments instead of diagnosis.

Splendor's in-loop corr(v,z) sat flat at 0.43-0.48 for iterations 4-14
(artifacts/strength/splendor_r4_metrics.jsonl) — the same signature as the
akropolis 0-32 run.  Both post-mortems blamed chance-noise in the value
target.  This script trains the recipe net OFFLINE from scratch on the
committed round-4 replay (runs/splendor_r4/replay.npz, 487k train /
10k TRUE-holdout examples) under one lever per arm and reports holdout
corr(v,z) (player-0 component, same formula as Coach._validate,
train/coach.py:325-330):

  base       recipe losses (q_weight 0.837, value_loss_weight 0.25)
  vlw1       value_loss_weight 0.25 -> 1.0
  qw0        q_weight 0.837 -> 0 (pure Z target; the blend drags the
             target toward search Q, which is NOT what corr measures)
  qw0_vlw1   both levers
  big        128x4 trunk (2.4x params) at recipe losses — capacity probe
  ceiling    value-dominated training (vlw 25, qw 0): if even this cannot
             lift holdout corr, the residual is chance-irreducible noise
             in Z itself (the universes lever, which needs fresh
             self-play, is the only remaining one)

Usage: python scripts/value_ab_r5.py [--steps 2000] [--arms a,b,...]
Appends one JSON row per arm to artifacts/strength/value_ab_r5.jsonl.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

ARMS = {
    #            ch  depth  q_w    vlw
    "base":     (64, 4,     0.837, 0.25),
    "vlw1":     (64, 4,     0.837, 1.0),
    "qw0":      (64, 4,     0.0,   0.25),
    "qw0_vlw1": (64, 4,     0.0,   1.0),
    "big":      (128, 4,    0.837, 0.25),
    "ceiling":  (64, 4,     0.0,   25.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replay", default="runs/splendor_r4/replay.npz")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--learn-rate", type=float, default=1e-3)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/strength/value_ab_r5.jsonl")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator (one 700-step arm is ~3 s "
                    "of chip; the 1-core CPU box needs ~30 min per arm)")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from alphazero_tpu.utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()
    import jax.numpy as jnp

    from alphazero_tpu.config import NetConfig, TrainConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net, param_count
    from alphazero_tpu.selfplay.codec import decode_batch
    from alphazero_tpu.train.learner import init_train_state, train_step

    spec = make_game("splendor")
    raw = dict(np.load(args.replay))
    A = spec.num_actions

    def dense(prefix=""):
        enc = {k[len(prefix):]: jnp.asarray(raw[prefix + k[len(prefix):]])
               for k in raw if k.startswith(prefix)
               and not k[len(prefix):].startswith("val_")
               and k[len(prefix):] in
               ("state", "pi_vals", "pi_idx", "z", "q", "valids")}
        d = decode_batch(enc, A)
        return {k: np.asarray(v) for k, v in d.items()}

    train = dense()
    val = {k[4:]: v for k, v in
           {k: raw[k] for k in raw if k.startswith("val_")}.items()}
    val = decode_batch({k: jnp.asarray(v) for k, v in val.items()
                        if k in ("state", "pi_vals", "pi_idx", "z", "q",
                                 "valids")}, A)
    val = {k: np.asarray(v) for k, v in val.items()}
    n = train["state"].shape[0]
    print(f"train {n} / holdout {val['state'].shape[0]}", flush=True)

    for arm in args.arms.split(","):
        ch, depth, qw, vlw = ARMS[arm]
        net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
        params = init_params(net, spec, jax.random.PRNGKey(args.seed))
        tc = TrainConfig(learn_rate=args.learn_rate,
                         batch_size=args.batch_size, q_weight=qw,
                         value_loss_weight=vlw)
        state = init_train_state(params, tc, args.steps)
        rng = np.random.default_rng(args.seed)
        key = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        for step in range(args.steps):
            ids = rng.choice(n, size=args.batch_size, replace=False)
            batch = {k: jnp.asarray(v[ids]) for k, v in train.items()}
            key, k = jax.random.split(key)
            state, m = train_step(spec, net, tc, args.steps, state, batch, k,
                                  augment=False)
            if step % 500 == 0:
                print(f"[{arm}] step {step}: loss {float(m.loss):.4f} "
                      f"(pi {float(m.loss_pi):.4f} v {float(m.loss_v):.4f})",
                      flush=True)

        fwd = jax.jit(lambda p, s, va: net.apply(
            p, jax.vmap(spec.observe)(s), va))
        vs, zs = [], []
        for i in range(0, val["state"].shape[0], 2048):
            _, v = fwd(state.params,
                       jnp.asarray(val["state"][i:i + 2048]),
                       jnp.asarray(val["valids"][i:i + 2048]))
            vs.append(np.asarray(v))
            zs.append(val["z"][i:i + 2048])
        v0 = np.concatenate(vs)[:, 0].astype(np.float64)
        z0 = np.concatenate(zs)[:, 0].astype(np.float64)
        corr = float(np.mean((v0 - v0.mean()) * (z0 - z0.mean()))
                     / (v0.std() * z0.std()))
        mse = float(np.mean((v0 - z0) ** 2))
        row = dict(arm=arm, channels=ch, depth=depth, q_weight=qw,
                   value_loss_weight=vlw, steps=args.steps,
                   params=param_count(state.params),
                   holdout_corr_vz=round(corr, 4),
                   holdout_mse_vz=round(mse, 4),
                   final_loss_v=round(float(m.loss_v), 4),
                   seconds=round(time.time() - t0, 1))
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
