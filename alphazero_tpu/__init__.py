"""alphazero_tpu — a TPU-native AlphaZero framework.

A from-scratch JAX/XLA re-design of the capabilities of
cestpasphoto/alpha-zero-general (CPU: Numba game logic + dict MCTS + ONNX
batched inference).  Here everything is vectorized and compiled:

- ``games``     pure-functional :class:`GameSpec` engines (state in, state out,
                static shapes) stepping thousands of boards in lockstep.
- ``search``    array-based batched MCTS (fixed-size node arrays, one tree per
                batch lane, NN evals batched across all trees each simulation).
- ``models``    flax policy/value networks with masked log-softmax heads.
- ``selfplay``  lax.scan self-play actor with auto-reset and on-device return
                backfill.
- ``train``     optax learner (AdamW + OneCycle), arena gating, coach loop.
- ``parallel``  jax.sharding mesh utilities (data/model axes) for multi-chip.
- ``ops``       pallas kernels for hot paths.
- ``utils``     glicko2 ratings, metrics, misc.
"""

__version__ = "0.1.0"
