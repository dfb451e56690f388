"""ldpc_tpu: TPU-native LDPC simulation, decoding and code search.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Omer-Sella/ldpc (see SURVEY.md for the structural map of the reference):

  codes/     QC shift tables, CCSDS near-earth + 802.11n codes, file
             formats, observation codecs, perturbation suites        (L0)
  ops/       batched BP decoders (min-sum family, sum-product), static
             and runtime-structured plans, fused Pallas kernel, numpy
             golden oracle                                           (L1)
  sim/       BPSK/AWGN channel, BER/FER statistics, Monte-Carlo sweep
             harness with staged decoding, reward fitting            (L2)
  envs/      code-search MDP (gym-style), spaces, vector env          (L3)
  rl/        autoregressive actor-critic, GAE buffer, PPO, VPG,
             random baseline                                          (L4)
  parallel/  device meshes, sharded sweeps, multi-host init           (L5)
  utils/     loggers, orbax checkpoints, config, experiment grids     (L5)
  analysis/  plots, dashboards, post-mortem tooling                   (L6)
  native/    AOT C++ host decode engine (ctypes)

Quick start::

    from ldpc_tpu.codes import near_earth_code
    from ldpc_tpu.sim import evaluate_code
    stats = evaluate_code(near_earth_code(), [3.0, 3.2, 3.4, 3.6], 1000)
    print(stats.summary())
"""

__version__ = "0.1.0"

__all__ = ["codes", "ops", "sim", "envs", "rl", "parallel", "utils",
           "analysis"]
