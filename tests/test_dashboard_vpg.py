"""Tests for the dashboards and the VPG algorithm."""

import numpy as np
import pytest

from ldpc_tpu.analysis.dashboard import CirculantDashboard, RewardPlotter
from ldpc_tpu.codes import wifi_code


def test_circulant_dashboard(tmp_path):
    code = wifi_code()
    dash = CirculantDashboard(code, file_name=tmp_path / "dash.png")
    dash.update_ber([3.0, 4.0], [1e-2, 1e-4], label="wifi")
    dash.update_circulant(code.replace_block(0, 0, (3, 5)))
    assert (tmp_path / "dash.png").exists()
    dash.close()


def test_reward_plotter(tmp_path):
    rp = RewardPlotter(file_name=tmp_path / "r.png")
    for r in (0.1, 0.5, -2.0):
        rp.append(r)
    assert (tmp_path / "r.png").exists()
    rp.close()


@pytest.mark.slow
def test_vpg_end_to_end_tiny(tmp_path):
    from ldpc_tpu.envs import LdpcCodeSearchEnv
    from ldpc_tpu.rl.model import ActorCriticConfig
    from ldpc_tpu.rl.vpg import VPGConfig, vpg

    def env_fn():
        return LdpcCodeSearchEnv(code=wifi_code(), snr_points=(3.0, 3.5),
                                 num_transmissions=2, num_iterations=5,
                                 seed=2, dmax_cn_cap=32, dmax_vn_cap=12)

    cfg = VPGConfig(steps_per_epoch=3, epochs=2, train_v_iters=2)
    ac = ActorCriticConfig(obs_dim=env_fn().observation_space.shape[0],
                           hidden=16, row_range=4, col_range=24, z=81,
                           max_hot=4)
    ap, cp, logger = vpg(env_fn, cfg, ac, output_dir=tmp_path / "exp")
    progress = (tmp_path / "exp" / "progress.txt").read_text().splitlines()
    assert len(progress) == 3
