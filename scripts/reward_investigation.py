"""Reward investigation — the executable equivalent of the reference's
``rewardInvestigation.ipynb`` (the last SURVEY §2 component, #52).

The notebook pokes at the code-search reward from five angles; this script
reproduces each as a computed, committed artifact instead of a stale
notebook:

1. **Fit behavior** — plain least squares vs the recursive fit
   (common.py:293-303) on a measured BER scatter: how dropping
   below-trend points changes slope/bias and therefore the reward.
2. **Monte-Carlo noise** — the notebook records rewards 0.3956 / 0.4672 /
   0.4656 for THE SAME code at numOfTransmissions=10 (ldpc_env.py:22's
   default): the reward of an unchanged code fluctuates by ~0.07 between
   RL steps.  We quantify that spread over many seeds and vs transmission
   count — the noise floor any learned policy has to beat.
3. **Realized vs nominal sigma** — the notebook's sigma/sigmaActual check
   (ldpc.py:51-60 semantics).
4. **Reference baselines** — the near-earth rewards over 3.0-3.8 and
   3.0-3.4 dB (postProcessing.py:18-19: 0.7958 / 0.3965) recomputed from
   OUR on-chip measured BER points (docs/ber_parity.json, 16k words/pt).
5. **Degenerate scatters** — all-zero BER (perfect code: the reference
   crashes in an empty polyfit; we latch the last valid fit) and
   single-point scatters (bad-candidate reward).

Runs on CPU in ~2 min (wifi code for the MC study; near-earth comes from
the committed chip measurements).  Writes docs/reward_investigation.md
(+ .json).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import os

    import jax
    if os.environ.get("LDPC_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])

    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.sim.evaluate import evaluate_code
    from ldpc_tpu.sim.reward import (BAD_CANDIDATE_REWARD, calc_reward,
                                     recursive_linear_fit)

    out: dict = {}
    # the env's near-earth window is 3.0-3.4 dB (ldpc_env.py:88); 802.11n's
    # waterfall sits lower, so the MC/fit studies use the equivalent window
    # ON ITS cliff — at 3.0+ dB wifi is error-free and every scatter is
    # degenerate (§5)
    snr_points = [2.0, 2.4, 2.8]
    code = wifi_code()

    # ---- 1+3: one evaluation, fit comparison + sigma check -------------
    stats = evaluate_code(code, snr_points, 40, max_iters=50,
                          batch_size=40, seed=7134066)
    (s_snr, s_ber, _, _, _, _, _) = stats.get_stats_v2()
    plain = np.polyfit(s_snr, s_ber, 1)
    xk, yk, rec, _, rounds = recursive_linear_fit(s_snr, s_ber)
    out["fit"] = {
        "points": int(len(s_snr)), "kept": int(len(xk)),
        "rounds": int(rounds),
        "plain_slope_bias": [float(v) for v in plain],
        "recursive_slope_bias": [float(v) for v in rec],
        "reward": calc_reward(s_snr, s_ber, snr_points),
    }
    sig = stats.column("sigma")
    siga = stats.column("sigma_actual")
    out["sigma"] = {
        "nominal_mean": float(sig.mean()),
        "realized_mean": float(siga.mean()),
        "max_rel_dev": float(np.max(np.abs(siga - sig) / sig)),
    }

    # ---- 2: reward noise floor vs transmissions -------------------------
    noise = {}
    for t in (10, 40):
        rewards = []
        for seed in range(24):
            st = evaluate_code(code, snr_points, t, max_iters=50,
                               batch_size=t, seed=1000 + seed)
            (ss, sb, _, _, _, _, _) = st.get_stats_v2()
            rewards.append(calc_reward(ss, sb, snr_points))
        rewards = np.asarray(rewards)
        noise[t] = {"mean": float(rewards.mean()),
                    "std": float(rewards.std()),
                    "min": float(rewards.min()),
                    "max": float(rewards.max())}
        print(f"[reward] wifi, {t} tx: reward {rewards.mean():.4f} "
              f"± {rewards.std():.4f}  [{rewards.min():.4f}, "
              f"{rewards.max():.4f}]", file=sys.stderr)
    out["mc_noise"] = noise

    # ---- 4: near-earth baselines from the chip-measured waterfall ------
    parity_path = "/root/repo/docs/ber_parity.json"
    base = None
    if os.path.exists(parity_path):
        with open(parity_path) as f:
            parity = json.load(f)
        snrs, bers = [], []
        for k, pt in parity["points"].items():
            snrs.append(pt["realized_snr_db"])
            bers.append(pt["xla_f32"]["ber"])
        order = np.argsort(snrs)
        snrs = np.asarray(snrs)[order]
        bers = np.asarray(bers)[order]
        base = {
            "measured_points": {f"{s:.4f}": float(b)
                                for s, b in zip(snrs, bers)},
            "reward_3p0_3p8": calc_reward(snrs, bers, [3.0, 3.8]),
            "reward_3p0_3p4": calc_reward(snrs, bers, [3.0, 3.4]),
            "reference_3p0_3p8": 0.7958451612664468,
            "reference_3p0_3p4": 0.3965108116285836,
        }
        print(f"[reward] near-earth from chip BER: "
              f"{base['reward_3p0_3p8']:.4f} (ref 0.7958) / "
              f"{base['reward_3p0_3p4']:.4f} (ref 0.3965)", file=sys.stderr)
    out["near_earth_baselines"] = base

    # ---- 5: degenerate scatters -----------------------------------------
    r_zero = calc_reward([3.0, 3.2, 3.4], [0.0, 0.0, 0.0], snr_points)
    r_single = calc_reward([3.0], [0.01], snr_points)
    out["degenerate"] = {"all_zero_ber": float(r_zero),
                         "single_point": float(r_single),
                         "bad_candidate": BAD_CANDIDATE_REWARD}

    with open("/root/repo/docs/reward_investigation.json", "w") as f:
        json.dump(out, f, indent=1)

    # ---- markdown narrative ---------------------------------------------
    f = out["fit"]
    n10, n40 = noise[10], noise[40]
    md = f"""# Reward investigation (rewardInvestigation.ipynb equivalent)

The code-search reward is the area between 1 and a line fitted to the
(realized SNR, per-frame BER) scatter over the sweep window
(`sim/reward.py`; ldpc_env.py:319-345).  This artifact answers the
questions the reference's notebook pokes at, as computed numbers.
Regenerate: `python scripts/reward_investigation.py` (CPU, ~2 min).

## 1. What the recursive fit does to the scatter

On a measured 802.11n scatter ({f['points']} frames over
{snr_points} dB — the window sits on wifi's waterfall; the env's 3.0-3.4
window is for near-earth), `recursive_linear_fit` kept {f['kept']}/{f['points']}
points after {f['rounds']} rounds; slope/bias moved from
{f['plain_slope_bias'][0]:+.4f}/{f['plain_slope_bias'][1]:+.4f} (plain
least squares — the notebook's `np.polyfit` cell) to
{f['recursive_slope_bias'][0]:+.4f}/{f['recursive_slope_bias'][1]:+.4f}.
Dropping below-trend points systematically STEEPENS the fitted waterfall:
the reward rewards the cliff, not the error floor.

## 2. The Monte-Carlo noise floor of the reward

The notebook records rewards 0.3956 / 0.4672 / 0.4656 for the SAME
near-earth code at the env default of 10 transmissions — ±0.04 of pure
sampling noise per RL step.  Reproduced on 802.11n over 24 seeds:

| transmissions/pt | reward mean | std | min | max |
|---|---|---|---|---|
| 10 (the env default count, ldpc_env.py:22) | {n10['mean']:.4f} | {n10['std']:.4f} | {n10['min']:.4f} | {n10['max']:.4f} |
| 40 | {n40['mean']:.4f} | {n40['std']:.4f} | {n40['min']:.4f} | {n40['max']:.4f} |

Any single-step reward difference below ~2 std is indistinguishable from
noise — why the PPO search needs either many transmissions per step or
advantage averaging over many steps, and why `docs/rl_search.md` re-scores
its winners with an independent high-transmission evaluation.

## 3. Realized vs nominal noise

sigma nominal {out['sigma']['nominal_mean']:.4f} vs realized
{out['sigma']['realized_mean']:.4f} (max per-frame relative deviation
{out['sigma']['max_rel_dev']:.3f}) — the notebook's sigma/sigmaActual
cell; the scatter's x-axis uses the REALIZED per-frame SNR, which is what
makes the fit meaningful at few transmissions.

## 4. Near-earth reward baselines from on-chip measurements
"""
    if base:
        md += f"""
Computed from the 16k-word-per-point chip-measured waterfall
(`docs/ber_parity.json`, XLA f32 engine) at the reference's realized SNRs:

| window | ours (measured) | reference constant (postProcessing.py:18-19) |
|---|---|---|
| 3.0-3.8 dB | {base['reward_3p0_3p8']:.4f} | 0.7958 |
| 3.0-3.4 dB | {base['reward_3p0_3p4']:.4f} | 0.3965 |

The 3.0-3.4 window agrees with the reference constant to within the MC
noise of their 200-frame runs (§2); the 3.0-3.8 window extrapolates the
fitted line far past the measured points, so both numbers are
fit-extrapolation artifacts more than code properties — see
docs/ber_parity.md for why the reference's published BER constants
themselves carry a decoder-state-leak bias.
"""
    md += f"""
## 5. Degenerate scatters

* All-zero BER (perfect code in-window): reward
  {out['degenerate']['all_zero_ber']:.4f} — the window width, the maximum
  attainable value.  The reference CRASHES here (empty polyfit in
  recursiveLinearFit); we latch the last valid fit (sim/reward.py:44-48).
* Single measured point: {out['degenerate']['single_point']:.1f}
  (= bad-candidate reward {out['degenerate']['bad_candidate']:.1f},
  ldpc_env.py:120) — a scatter that cannot support a line fit scores like
  an illegal action.
"""
    with open("/root/repo/docs/reward_investigation.md", "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
