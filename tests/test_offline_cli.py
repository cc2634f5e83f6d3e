"""Offline tooling CLI (the reference's GenericNNetWrapper.__main__ +
Coach.__main__ replay surgery)."""

import json
import os

import numpy as np
import pytest

from alphazero_tpu.cli import offline
from alphazero_tpu.games import make_game


@pytest.fixture(scope="module")
def replay_path(tmp_path_factory):
    """Synthetic replay for the no-gods Santorini flagship."""
    spec = make_game("santorini", nb_gods=1, init_method=1)
    rng = np.random.default_rng(0)
    n = 64
    state = rng.integers(-2, 3, size=(n, *spec.state_shape), dtype=np.int8)
    pi = rng.random((n, spec.num_actions)).astype(np.float16)
    pi /= pi.sum(-1, keepdims=True)
    z = rng.choice([-1.0, 1.0], size=(n, spec.num_players)) \
        .astype(np.float16)
    q = (rng.random((n, spec.num_players)) * 2 - 1).astype(np.float16)
    valids = np.ones((n, spec.num_actions), bool)
    path = tmp_path_factory.mktemp("replay") / "replay.npz"
    np.savez_compressed(path, state=state, pi=pi, z=z, q=q, valids=valids,
                        meta=np.array([0, n, n]))
    return str(path)


def test_merge_split_binarize(replay_path, tmp_path):
    merged = str(tmp_path / "merged.npz")
    offline.main(["merge", replay_path, replay_path, "--out", merged])
    d = np.load(merged)
    assert d["state"].shape[0] == 128

    test_split = str(tmp_path / "test.npz")
    offline.main(["split", merged, "--every", "8", "--out", test_split])
    assert np.load(test_split)["state"].shape[0] == 16

    binz = str(tmp_path / "bin.npz")
    offline.main(["binarize", replay_path, "--out", binz])
    pi = np.load(binz)["pi"].astype(np.float32)
    assert ((pi == 0) | (pi == 1)).all() and (pi.sum(-1) == 1).all()


def test_offline_train_and_inspect(replay_path, tmp_path, capsys):
    offline.main(["train", "santorini",
                  "--variant", json.dumps(dict(nb_gods=1, init_method=1)),
                  "--replay", replay_path, "--steps", "4",
                  "--channels", "16", "--depth", "1", "-b", "16",
                  "--out", str(tmp_path / "ck")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"])
    assert os.path.exists(tmp_path / "ck" / "params.msgpack")

    offline.main(["inspect", "santorini",
                  "--variant", json.dumps(dict(nb_gods=1, init_method=1)),
                  "--channels", "16", "--depth", "1", "-b", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["params"] > 1000
