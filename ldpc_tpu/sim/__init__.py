"""Simulation layer: channel, statistics, evaluation, reward (layer L2)."""

from .channel import (awgn, epsilon_probe, llr_from_channel, modulate,
                      slicer, snr_db_to_sigma, transmit_codewords,
                      transmit_zero_codeword)
from .stats import BerStatistics, snr_db_actual
from .evaluate import (evaluate_code, evaluate_epsilon_probe,
                       random_codeword_sweep_step, sweep_step)
from .reward import (BAD_CANDIDATE_REWARD, calc_reward, piecewise_fit,
                     piecewise_linear, recursive_linear_fit)

__all__ = [
    "awgn", "epsilon_probe", "llr_from_channel", "modulate", "slicer",
    "snr_db_to_sigma", "transmit_zero_codeword", "transmit_codewords",
    "BerStatistics", "snr_db_actual",
    "evaluate_code", "evaluate_epsilon_probe", "sweep_step",
    "random_codeword_sweep_step",
    "BAD_CANDIDATE_REWARD", "calc_reward", "piecewise_fit",
    "piecewise_linear", "recursive_linear_fit",
]
