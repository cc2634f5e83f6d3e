"""Serving export (the reference's chkpt_to_onnx analog via jax.export)."""

import json
import os

import jax
import numpy as np

from alphazero_tpu.cli import export as export_cli
from alphazero_tpu.config import Config, GameConfig, NetConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.train.checkpoint import save_checkpoint


def test_export_roundtrip(tmp_path, capsys):
    spec = make_game("santorini", nb_gods=1, init_method=1)
    cfg = Config(game=GameConfig(name="santorini",
                                 variant=dict(nb_gods=1, init_method=1)),
                 net=NetConfig(version=0, channels=16, depth=1))
    net = make_net(spec, cfg.net)
    params = init_params(net, spec, jax.random.PRNGKey(0))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, params, cfg)

    export_cli.main(["santorini", ck,
                     "--variant", json.dumps(dict(nb_gods=1, init_method=1)),
                     "--check"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["check"] == "ok"
    assert os.path.getsize(out["out"]) > 1000

    # the artifact is callable without any model code, at any batch size
    from jax import export as jexport
    import jax.numpy as jnp
    with open(out["out"], "rb") as f:
        loaded = jexport.deserialize(f.read())
    pi, v = loaded.call(jnp.zeros((3, *spec.obs_shape), jnp.float32),
                        jnp.ones((3, spec.num_actions), bool))
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, atol=1e-3)
