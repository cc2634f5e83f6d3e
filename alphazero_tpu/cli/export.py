"""Checkpoint -> serialized inference artifact.

The reference exports torch checkpoints to ONNX with a dynamic batch axis
for its inference runtime (/root/reference/chkpt_to_onnx.py:22-53,
GenericNNetWrapper.export_and_load_onnx :300-329).  The TPU-native analog is
``jax.export``: the jitted forward pass is lowered to StableHLO with a
symbolic batch dimension and serialized to one portable file that any JAX
runtime can deserialize and call without the model code.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="alphazero_tpu export")
    p.add_argument("game", nargs="?", default="santorini")
    p.add_argument("checkpoint", help="checkpoint dir (params + config)")
    p.add_argument("--out", "-o", default=None,
                   help="output file (default: <checkpoint>/model.jaxexp)")
    p.add_argument("--variant", default="{}")
    p.add_argument("--check", action="store_true",
                   help="deserialize and run the artifact after writing")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export as jexport

    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config

    spec = make_game(args.game, **json.loads(args.variant))
    cfg = load_config(args.checkpoint)
    net = make_net(spec, cfg.net)
    template = init_params(net, spec, jax.random.PRNGKey(0))
    params, _, _, _ = load_checkpoint(args.checkpoint, template)

    def forward(obs, valids):
        log_pi, v = net.apply(params, obs, valids)
        return jnp.exp(log_pi), v

    # dynamic batch axis (the reference's ONNX dynamic_axes)
    b = jexport.symbolic_shape("b")[0]
    obs_t = jax.ShapeDtypeStruct((b, *spec.obs_shape), jnp.float32)
    val_t = jax.ShapeDtypeStruct((b, spec.num_actions), jnp.bool_)
    exported = jexport.export(jax.jit(forward))(obs_t, val_t)
    blob = exported.serialize()

    out = args.out or os.path.join(args.checkpoint, "model.jaxexp")
    with open(out, "wb") as f:
        f.write(blob)
    logging.info("wrote %s (%d bytes, platforms %s)", out, len(blob),
                 exported.platforms)

    if args.check:
        with open(out, "rb") as f:
            loaded = jexport.deserialize(f.read())
        for bs in (1, 5):
            obs = jnp.zeros((bs, *spec.obs_shape), jnp.float32)
            valids = jnp.ones((bs, spec.num_actions), bool)
            pi, v = loaded.call(obs, valids)
            assert pi.shape == (bs, spec.num_actions)
            assert v.shape == (bs, spec.num_players)
        print(json.dumps(dict(out=out, bytes=len(blob), check="ok")))
    else:
        print(json.dumps(dict(out=out, bytes=len(blob))))


if __name__ == "__main__":
    main()
