"""The LDPC code-search environment (reference ``LdpcEnv``, TPU-native).

MDP (matching ``gym-ldpc/gym_ldpc/envs/ldpc_env.py``):
  * state: a QC parity code, starting at CCSDS near-earth
    (ldpc_env.py:82-90);
  * observation: circulant first rows bit-packed to 2048 uint8 bytes
    (``compress``, ldpc_env.py:379-394);
  * action: 516 bits = [1-bit block row x | 4-bit block col y | 511-bit new
    circulant first row] (ldpc_env.py:100-104,169-209);
  * step: functionally replace circulant (x, y), run a Monte-Carlo sweep
    over SNR [3.0, 3.2, 3.4] x 10 transmissions at 50 iterations
    (ldpc_env.py:88,110-114), reward = area between 1 and the recursively
    fitted BER line (ldpc_env.py:319-345);
  * episode ends when accumulated decode time exceeds the budget
    (ldpc_env.py:25,260-262); illegal actions score -2.0 without mutating
    state (ldpc_env.py:120-121).

TPU-native differences (design, not behavior):
  * the whole (SNR x transmissions) sweep of one step is ONE batched decode
    on the accelerator — the reference fans it out to 1-4 GPUs via process
    pools (ldpc_env.py:353-377, ldpcCUDA.py:891-932);
  * decoding uses the structure-generic dynamic-plan decoder
    (``ops/dynamic.py``), so mutated codes never recompile — the reference
    recompiles its CUDA kernels per evaluation under a global lock;
  * the state is a pure ``QCCode`` value (functional replace), making reset
    free and the env trivially checkpointable;
  * actions that would push a block row/col past the compiled degree caps
    are rejected as illegal (the reference has no such guard because it
    pays recompilation instead).

``replacement_only`` mode swaps the circulants at two coordinate pairs
(ldpc_env.py:185-200).  NOTE the reference's implementation reads the
second circulant from block (xr, xr) instead of (xr, yr) — an indexing bug;
we implement the documented swap.
"""

from __future__ import annotations

import time

import numpy as np

from ..codes import compress, near_earth_code
from ..codes.qc import QCCode
from ..sim.reward import BAD_CANDIDATE_REWARD, calc_reward
from ..sim.stats import BerStatistics
from .spaces import BinarySpace, Uint8Space

__all__ = ["LdpcCodeSearchEnv", "DEFAULT_SNR_POINTS",
           "DEFAULT_NUM_TRANSMISSIONS", "DEFAULT_NUM_ITERATIONS",
           "DEFAULT_TIME_BUDGET_S"]

DEFAULT_SNR_POINTS = (3.0, 3.2, 3.4)       # ldpc_env.py:88
DEFAULT_NUM_TRANSMISSIONS = 10             # LDPC_ENV_NUMBER_OF_TRANSMISSIONS
DEFAULT_NUM_ITERATIONS = 50                # LDPC_ENV_NUMBER_OF_ITERATIONS
DEFAULT_TIME_BUDGET_S = 640.0              # 64 * numTransmissions, :25


class LdpcCodeSearchEnv:
    """Gym-style env; ``step`` returns (obs, reward, done, info)."""

    metadata = {"render.modes": ["rgb"]}

    def __init__(self,
                 code: QCCode | None = None,
                 snr_points=DEFAULT_SNR_POINTS,
                 num_transmissions=DEFAULT_NUM_TRANSMISSIONS,
                 num_iterations: int = DEFAULT_NUM_ITERATIONS,
                 seed: int = 7134066,
                 replacement_only: bool = False,
                 time_budget_s: float = DEFAULT_TIME_BUDGET_S,
                 iteration_budget: int | str | None = "auto",
                 dmax_cn_cap: int = 48,
                 dmax_vn_cap: int = 18,
                 decoder_kind: str = "min-sum",
                 decoder_backend: str = "dynamic",
                 floor_penalty: float = 0.0,
                 floor_snr_index: int = -1,
                 phase1_iterations: int | None = None):
        self.reset_value = code if code is not None else near_earth_code()
        self.state = self.reset_value
        self.z = self.state.z
        self.x_bits = max(1, (self.state.block_rows - 1).bit_length())
        self.y_bits = max(1, (self.state.block_cols - 1).bit_length())
        self.replacement_only = replacement_only
        if replacement_only:
            self.action_bits = 2 * (self.x_bits + self.y_bits)
        else:
            self.action_bits = self.x_bits + self.y_bits + self.z
        self.action_space = BinarySpace(self.action_bits)
        obs = compress(self.state)
        self.observation_space = Uint8Space(obs.shape[0])

        self.snr_points = np.asarray(snr_points, np.float64)
        # Per-SNR-point transmission counts: an int applies to every point
        # (reference semantics); a sequence gives each point its own count
        # — the TPU-first asymmetric-evaluation trick: thousands of words
        # at the HIGH-SNR (floor) points cost almost nothing because they
        # converge in ~4-6 iterations, making floor-aware rewards
        # measurable inside an RL step.
        if np.ndim(num_transmissions) == 0:
            tx = np.full(len(self.snr_points), int(num_transmissions),
                         np.int64)
        else:
            tx = np.asarray(num_transmissions, np.int64)
            if tx.shape[0] != len(self.snr_points):
                raise ValueError(
                    f"num_transmissions sequence needs one entry per SNR "
                    f"point: {tx.shape[0]} vs {len(self.snr_points)}")
        self.tx_counts = tx
        self.num_transmissions = int(tx[0]) if (tx == tx[0]).all() \
            else tuple(int(t) for t in tx)
        self.num_iterations = int(num_iterations)
        self.time_budget_s = float(time_budget_s)
        # Floor-aware reward shaping: subtract ``sum_i penalty_i * FER``
        # at snr_points[floor_snr_index_i] from the fitted-line reward.
        # The plain integral is waterfall-dominated, so iterated searches
        # buy waterfall with error floor (docs/boot_code.md); the penalty
        # makes the floor part of the objective.  A scalar penalty + index
        # is the single-point r4 objective; sequences give each floor
        # point its own weight (multi-point floor terms, VERDICT r4 #1).
        # ``floor_penalty_scale`` multiplies every term — the annealing
        # knob a training loop can ramp per epoch (rl/ppo.py
        # ``epoch_callback``) without rebuilding the env.  0.0 penalties
        # = reference reward (ldpc_env.py:319-345).
        pens = np.atleast_1d(np.asarray(floor_penalty, np.float64))
        idxs = np.atleast_1d(np.asarray(floor_snr_index, np.int64))
        if pens.shape[0] != idxs.shape[0]:
            if pens.shape[0] == 1:
                pens = np.repeat(pens, idxs.shape[0])
            elif idxs.shape[0] == 1:
                idxs = np.repeat(idxs, pens.shape[0])
            else:
                raise ValueError(
                    f"floor_penalty and floor_snr_index lengths differ: "
                    f"{pens.shape[0]} vs {idxs.shape[0]}")
        self.floor_penalties = pens
        self.floor_snr_indices = idxs
        self.floor_penalty_scale = 1.0
        # The PRIMARY episode terminator is the decode-iteration budget:
        # unlike the reference's wall-clock budget (ldpc_env.py:25,260-262,
        # kept as a secondary circuit breaker via time_budget_s), iteration
        # counts are deterministic, so episode lengths reproduce across
        # backends, batching modes and hardware.  "auto" re-expresses the
        # reference's 64*numTransmissions-second constant in iterations:
        # one unit of their budget ~ one full-budget transmission decode
        # (sequence counts: their mean, so deep-floor points don't shrink
        # episodes).
        if iteration_budget == "auto":
            iteration_budget = int(64 * float(tx.mean())
                                   * self.num_iterations)
        self.iteration_budget = iteration_budget
        self.reward_for_illegal_action = BAD_CANDIDATE_REWARD
        self.dmax_cn_cap = int(dmax_cn_cap)
        self.dmax_vn_cap = int(dmax_vn_cap)
        self.decoder_kind = decoder_kind
        self.decoder_backend = decoder_backend
        # Host-staged env decode (dynamic backend): decode the step's
        # batch at a small cap first and re-decode only the failures at
        # the full budget — per-word results identical by convergence
        # latching, but a deep floor point (thousands of easy words plus
        # a ~50%-probability straggler) no longer charges the whole batch
        # the full 50 sweeps.  None = single-pass (reference semantics,
        # same results either way).
        self.phase1_iterations = (int(phase1_iterations)
                                  if phase1_iterations else None)
        self.rng = np.random.RandomState(seed)
        self.seed_value = seed

        self.accumulated_evaluation_time = 0.0
        self.accumulated_iterations = 0
        self.ber_stats = BerStatistics(self.state.n)
        self.scatter_snr = self.snr_points.copy()
        self.scatter_ber = np.ones(len(self.snr_points))
        self.observed_state = obs

    # ------------------------------------------------------------------
    def _decode_batched(self, code: QCCode, llr):
        """One batched decode of all (snr x transmission) words."""
        import jax.numpy as jnp

        if self.decoder_backend == "dynamic":
            from ..ops.dynamic import dynamic_plan, make_dynamic_decoder

            def dec_for(iters):
                return make_dynamic_decoder(
                    code.z, code.block_rows, code.block_cols,
                    self.dmax_cn_cap, self.dmax_vn_cap, iters,
                    kind=self.decoder_kind)

            plan = dynamic_plan(code, self.dmax_cn_cap, self.dmax_vn_cap)
            llr = jnp.asarray(llr)
            if (not self.phase1_iterations
                    or self.phase1_iterations >= self.num_iterations):
                return dec_for(self.num_iterations)(plan, llr)
            return self._staged_dynamic_decode(dec_for, plan, llr)
        from ..ops.decoder import decoder_for_code
        return decoder_for_code(code, self.num_iterations,
                                kind=self.decoder_kind)(jnp.asarray(llr))

    def _staged_dynamic_decode(self, dec_for, plan, llr):
        """Two-phase host-staged decode: phase-1 cap for the whole batch,
        full-budget re-decode of the failures only (fixed-size chunks so
        at most two phase-2 shapes ever compile).  Per-word results are
        IDENTICAL to the single-pass decode (convergence latching: a word
        converging within phase 1 is final; a failed word's re-decode is
        the deterministic full decode of the same LLRs)."""
        import jax.numpy as jnp

        from ..ops.decoder import DecodeResult

        res1 = dec_for(self.phase1_iterations)(plan, llr)
        success = np.asarray(res1.success).copy()
        failed = np.flatnonzero(~success)
        if failed.size == 0:
            return res1
        hard = np.asarray(res1.hard).copy()
        iters = np.asarray(res1.iterations).copy()
        b = llr.shape[0]
        dec2 = dec_for(self.num_iterations)
        if failed.size > 0.25 * b:
            res2 = dec2(plan, llr)
            redo = ~success
            hard[redo] = np.asarray(res2.hard)[redo]
            iters[redo] = np.asarray(res2.iterations)[redo]
            success[redo] = np.asarray(res2.success)[redo]
        else:
            chunk = min(256, b)
            for lo in range(0, failed.size, chunk):
                part = failed[lo:lo + chunk]
                idx = np.concatenate(
                    [part, np.zeros(chunk - part.size, np.int64)])
                res2 = dec2(plan, jnp.take(llr, jnp.asarray(idx), axis=0))
                hard[part] = np.asarray(res2.hard)[:part.size]
                iters[part] = np.asarray(res2.iterations)[:part.size]
                success[part] = np.asarray(res2.success)[:part.size]
        return DecodeResult(hard=hard, iterations=iters, success=success,
                            soft=np.zeros((b, 0), np.float32))

    def _degrees_ok(self, code: QCCode) -> bool:
        return (max(code.row_degrees()) <= self.dmax_cn_cap and
                max(code.col_degrees()) <= self.dmax_vn_cap)

    def _transmit(self):
        """Sample this step's (SNR x transmissions) LLR batch.

        Draws from the env's own RandomState, so batched multi-env stepping
        consumes exactly the same randomness per env as sequential stepping.
        """
        import jax
        import jax.numpy as jnp

        from ..sim.channel import awgn

        snr_per_word = np.repeat(self.snr_points, self.tx_counts)
        b = snr_per_word.shape[0]
        key = jax.random.key(int(self.rng.randint(0, 2 ** 31 - 1)))
        clean = jnp.full((b, self.state.n), -1.0, jnp.float32)
        noisy, sigma, sigma_actual = awgn(
            key, clean, jnp.asarray(snr_per_word, jnp.float32))
        return snr_per_word, noisy, sigma, sigma_actual

    def _stats_from_decode(self, snr_per_word, noisy, sigma, sigma_actual,
                           res) -> BerStatistics:
        errs_unc = np.asarray((np.asarray(noisy) > 0).sum(axis=1))
        errs_dec = np.asarray(res.hard, np.int64).sum(axis=1)
        stats = BerStatistics(self.state.n)
        stats.add_batch(snr=snr_per_word, sigma=np.asarray(sigma),
                        sigma_actual=np.asarray(sigma_actual),
                        errors_uncoded=errs_unc, errors_decoded=errs_dec,
                        iterations=np.asarray(res.iterations),
                        max_iterations=self.num_iterations,
                        success=np.asarray(res.success))
        return stats

    def _charge(self, wall_s: float, res) -> None:
        """Accrue this step's evaluation cost against the episode budgets."""
        self.accumulated_evaluation_time += wall_s
        self.accumulated_iterations += int(np.asarray(res.iterations).sum())

    def evaluate_code(self) -> BerStatistics:
        """Monte-Carlo evaluate the current state (ldpc_env.py:353-377)."""
        t0 = time.time()
        snr_per_word, noisy, sigma, sigma_actual = self._transmit()
        res = self._decode_batched(self.state, noisy)
        stats = self._stats_from_decode(snr_per_word, noisy, sigma,
                                        sigma_actual, res)
        self._charge(time.time() - t0, res)
        return stats

    # ------------------------------------------------------------------
    def _split_action(self, action):
        action = np.asarray(action).reshape(-1)
        if action.shape[0] != self.action_bits:
            raise ValueError(
                f"action must have {self.action_bits} bits, got "
                f"{action.shape[0]}")
        xb, yb = self.x_bits, self.y_bits
        # big-endian bit packing, matching xCoordinateBinaryToInt =
        # flipud(2**arange) (ldpc_env.py:116-117)
        x = int(action[:xb] @ (2 ** np.arange(xb)[::-1]))
        y = int(action[xb:xb + yb] @ (2 ** np.arange(yb)[::-1]))
        rest = action[xb + yb:]
        return x, y, rest

    def _prepare_step(self, action):
        """Action -> (legal, candidate code) without evaluating."""
        x, y, rest = self._split_action(action)
        legal = x < self.state.block_rows and y < self.state.block_cols
        candidate = None
        if legal:
            if self.replacement_only:
                xr = int(rest[:self.x_bits] @
                         (2 ** np.arange(self.x_bits)[::-1]))
                yr = int(rest[self.x_bits:] @
                         (2 ** np.arange(self.y_bits)[::-1]))
                legal = (xr < self.state.block_rows and
                         yr < self.state.block_cols)
                if legal:
                    a = self.state.shifts[x][y]
                    bshifts = self.state.shifts[xr][yr]
                    candidate = self.state.replace_block(
                        x, y, bshifts).replace_block(xr, yr, a)
            else:
                candidate = self.state.replace_block(x, y, rest)
            if candidate is not None and not self._degrees_ok(candidate):
                legal, candidate = False, None
        return legal and candidate is not None, candidate

    def _finish_step(self, legal: bool, stats: BerStatistics | None):
        """Reward from the evaluated stats + budget/done/obs bookkeeping."""
        if legal and stats is not None:
            self.ber_stats = stats
            (scatter_snr, scatter_ber, _, _, _, ber_data,
             _) = self.ber_stats.get_stats_v2()
            self.scatter_snr, self.scatter_ber = scatter_snr, scatter_ber
            self.ber_points = ber_data
            reward = calc_reward(scatter_snr, scatter_ber, self.snr_points)
            for pen, idx in zip(self.floor_penalties,
                                self.floor_snr_indices):
                if not pen:
                    continue
                snr_f = self.snr_points[idx]
                sel = stats.column("snr") == snr_f
                w = stats.column("weight")[sel].sum()
                fer = (stats.column("frame_errors")[sel].sum() / w
                       if w else 0.0)
                reward -= self.floor_penalty_scale * pen * float(fer)
        else:
            reward = self.reward_for_illegal_action

        done = self.accumulated_evaluation_time > self.time_budget_s
        if self.iteration_budget is not None:
            done = done or (self.accumulated_iterations >
                            self.iteration_budget)
        self.observed_state = compress(self.state)
        info = {
            "legal": legal,
            "accumulated_evaluation_time": self.accumulated_evaluation_time,
            "accumulated_iterations": self.accumulated_iterations,
        }
        return self.observed_state, float(reward), bool(done), info

    def step(self, action):
        legal, candidate = self._prepare_step(action)
        stats = None
        if legal:
            self.state = candidate
            stats = self.evaluate_code()
        return self._finish_step(legal, stats)

    def reset(self):
        self.state = self.reset_value
        self.observed_state = compress(self.state)
        self.ber_points = np.ones(len(self.snr_points))
        self.accumulated_evaluation_time = 0.0
        self.accumulated_iterations = 0
        return self.observed_state

    def render(self, mode="rgb", close=False):
        return None

    def seed(self, seed=None):
        self.rng = np.random.RandomState(seed)
        return [seed]

    # convenience accessors mirroring the reference codec entry points
    def compress(self) -> np.ndarray:
        return compress(self.state)

    def uncompress(self, observation) -> QCCode:
        from ..codes import uncompress
        return uncompress(observation, self.state.block_rows,
                          self.state.block_cols, self.z)
