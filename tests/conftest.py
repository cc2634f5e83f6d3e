"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin at interpreter
startup, so JAX_PLATFORMS in the environment is not enough — we must switch
the platform via jax.config after import (verified to work post-registration).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 tree math is required for exact search parity with the reference's
# Python-float MCTS; framework code uses explicit dtypes so this only enables
# (not forces) wide types.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

# Persistent XLA compile cache across test runs: the fast lane's wall time
# is dominated by recompiling the SAME tiny jitted programs every run
# (~110 s of single-core CPU, most of it XLA).  Cache keys include platform
# + flags + HLO, so correctness is structural; first run is unchanged,
# subsequent runs skip the recompiles.  (utils.compile_cache fails soft on
# read-only HOME.)
from alphazero_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


# ---------------------------------------------------------------------------
# Fast/slow tiering.  The default run (pytest.ini addopts -m "not slow")
# must stay under ~2 minutes; the full suite runs with  pytest -m "".
# Slow membership is centralized here (substring match on the test nodeid)
# so test files stay marker-free.  Policy: every game keeps at least one
# oracle full-game parity case in the fast tier where that case is cheap;
# extra seeds, multi-minute integration loops and statistical tests are slow.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

SLOW_PATTERNS = (
    # integration / statistical loops
    "test_population.py::test_population_steps_and_exploit",
    "test_population.py::test_asha_rungs_and_replacement",
    "test_display_players.py::test_universe_step_int32_all_games",
    "test_display_players.py::test_greedy_player_host_interface",
    "test_display_players.py::test_host_game_random_vs_random",
    "test_display_players.py::test_greedy_beats_random_abalone",
    "test_multichip.py",
    "test_train.py::test_dryrun_multichip_8",
    "test_train.py::test_arena_self_match_balanced",
    "test_train.py::test_symmetry_augment_runs",
    "test_train.py::test_train_step_reduces_loss",
    "test_selfplay.py::test_shapes_and_counts",
    "test_selfplay.py::test_policy_targets_valid",
    "test_selfplay.py::test_returns_are_win_loss_pairs",
    "test_selfplay.py::test_unfinished_tail_has_zero_weight",
    "test_selfplay.py::test_replay_roundtrip",
    "test_selfplay.py::test_chunked_encoded_matches_dense",
    "test_selfplay.py::test_replay_encoded_matches_dense",
    "test_selfplay.py::test_chunked_quota_early_exit",
    "test_selfplay.py::test_dyn_selfplay_bitexact_and_quota",
    "test_selfplay.py::test_dyn_staged_bitexact",
    "test_selfplay.py::test_merged_pcr_examples_valid",
    "test_train.py::test_arena_dyn_runner_bitexact",
    "test_train.py::test_arena_host_runner",
    "test_mcts_parity.py::test_mcts_prefers_immediate_win",
    "test_offline_cli.py::test_offline_train_and_inspect",
    "test_akropolis_bot.py::test_decisions_match_reference",
    "test_akropolis_bot.py::test_undefeated_beats_random",
    "test_mcts_parity.py::test_budget_masking",
    "test_mcts_parity.py::test_dirichlet_noise",
    # heavy model variants (keep the small ones fast)
    "test_models.py::test_forward_and_grad[santorini",
    "test_models.py::test_forward_and_grad[splendor-variant3",
    "test_models.py::test_forward_and_grad[splendor-variant4",
    "test_models.py::test_knowledge_transfer_across_versions",
    # smallworld full games are ~25 s each
    "test_smallworld_parity.py::test_full_game_parity",
    "test_smallworld_parity.py::test_random_game_terminates",
    # botanik full-game cases are 12-17 s each
    "test_botanik_parity.py::test_full_game_parity",
    "test_botanik_parity.py::test_random_game_terminates_and_scores",
    "test_botanik_parity.py::test_symmetries_consistency",
    # chance-loop statistical tests
    "test_splendor_parity.py::test_true_random_chance_stays_legal",
    "test_minivilles_parity.py::test_true_random_game_terminates",
    "test_akropolis_parity.py::test_multiplayer_random_game",
    "test_multiplayer_parity.py",
    "test_tree_reuse.py::test_reuse_matches_reference_persistent_mcts",
    "test_tree_reuse.py::test_arena_reuse_flag_runs",
    "test_train.py::test_arena_fixed_position_injection",
    # long-tail trims to hold the fast tier under 2 minutes
    "test_export_cli.py::test_export_roundtrip",
    "test_azul_parity.py::test_scores_round_and_batch",
    "test_santorini_parity.py::test_vmapped_batch_consistency",
    "test_akropolis_parity.py::test_rotation_symmetry_consistency",
    "test_akropolis_parity.py::test_full_game_parity[3-14142]",
    "test_train.py::test_knowledge_transfer_crop",
    "test_mcts_parity.py::test_search_parity[False",
    "test_display_players.py::test_render[smallworld]",
    "test_display_players.py::test_render[minivilles]",
    "test_display_players.py::test_render[splendor]",
)

# keep the FIRST full-game seed of each parametrized oracle run fast,
# mark the rest slow (coverage identical per seed; seeds only vary the
# random playthrough)
_EXTRA_SEED_RE = (
    ("test_santorini_parity.py::test_full_game_parity[", "[0]"),
    ("test_santorini_gods_parity.py::test_full_game_parity[", "[0]"),
    ("test_splendor_parity.py::test_full_game_parity_deterministic_chance[",
     "[0]"),
    ("test_azul_parity.py::test_full_game_parity[", "[0]"),
    ("test_minivilles_parity.py::test_full_game_parity[", "[0]"),
    ("test_tlp_parity.py::test_full_game_parity[", "[0]"),
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        if any(p in nid for p in SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
            continue
        for prefix, keep in _EXTRA_SEED_RE:
            if prefix in nid and not nid.endswith(keep):
                item.add_marker(pytest.mark.slow)
                break
