"""Tests for layer L6: plots and post-mortem analysis."""

import numpy as np
import pytest

from ldpc_tpu.analysis import (REFERENCE_NEAR_EARTH_BER, action_heatmaps,
                               pam2_ber, plot_decoder_throughput,
                               plot_evaluation_data, plot_snr_vs_ber,
                               plot_snr_vs_iterations,
                               post_mortem_best_codes)
from ldpc_tpu.codes import compress, wifi_code


def test_pam2_matches_reference_table():
    """common.py:104-110 hardcodes berPam2 for SNR 2..10 dB."""
    ref = [3.75061284e-02, 2.28784076e-02, 1.25008180e-02, 5.95386715e-03,
           2.38829078e-03, 7.72674815e-04, 1.90907774e-04, 3.36272284e-05,
           3.87210822e-06]
    np.testing.assert_allclose(pam2_ber(np.arange(2.0, 10.5, 1.0)), ref,
                               rtol=1e-5)


def test_plots_render_and_save(tmp_path):
    snr = np.array([3.0, 3.2, 3.4, 3.6])
    ber = np.array([2e-2, 1e-2, 1e-3, 0.0])
    fig, ax = plot_snr_vs_ber(snr, ber, file_name=tmp_path / "ber.png")
    assert (tmp_path / "ber.png").exists()
    plot_snr_vs_iterations(snr, [40, 20, 9, 6],
                           file_name=tmp_path / "itr.png")
    plot_decoder_throughput({"TPU v5e (this work)":
                             [1.4e7, 1.6e7, 1.6e7, 1.7e7]},
                            file_name=tmp_path / "tp.png")
    rng = np.random.RandomState(0)
    scatter_snr = np.repeat(snr, 8) + rng.normal(0, 0.05, 32)
    scatter_ber = np.clip(
        np.repeat(ber, 8) + rng.normal(0, 2e-3, 32), 0, 1)
    plot_evaluation_data(scatter_snr, scatter_ber,
                         file_name=tmp_path / "eval.png")
    assert all((tmp_path / f).exists()
               for f in ("itr.png", "tp.png", "eval.png"))


@pytest.fixture()
def steps_tsv(tmp_path):
    wifi = wifi_code()
    obs_hex = bytes(compress(wifi)).hex()
    mutated_hex = bytes(compress(wifi.replace_block(0, 0, (7,)))).hex()
    rows = ["epoch\tstep\treward\tvalue\tlogp\ti\tj\tk\tobservation_hex"]
    for e in range(2):
        for t in range(3):
            r = 0.9 if (e, t) == (1, 2) else 0.1 * t
            hx = mutated_hex if (e, t) == (1, 2) else obs_hex
            rows.append(f"{e}\t{t}\t{r}\t0.0\t-2.0\t{t % 2}\t{t}\t2\t{hx}")
    p = tmp_path / "steps.tsv"
    p.write_text("\n".join(rows) + "\n")
    return p


def test_post_mortem_best_codes(steps_tsv):
    wifi = wifi_code()
    results = post_mortem_best_codes(
        steps_tsv, block_rows=wifi.block_rows, block_cols=wifi.block_cols,
        z=wifi.z, snr_points=(3.5,), num_transmissions=4, max_iters=8)
    assert len(results) == 1
    code, stats = results[0]
    assert code.shifts[0][0] == (7,)  # the mutated best code came back
    assert len(stats) == 4


def test_action_heatmaps(steps_tsv, tmp_path):
    grids = action_heatmaps(steps_tsv, save_figures=True)
    assert set(grids) == {"i", "j", "k"}
    assert grids["k"].shape == (1, 2)      # k always 2, 2 epochs
    assert grids["i"].shape[1] == 2
    assert (steps_tsv.parent / "heatMapI.png").exists()


def test_reward_surface_grid(tmp_path):
    from ldpc_tpu.analysis import reward_surface

    slope, bias, reward = reward_surface(save_path=tmp_path / "surf.png")
    assert slope.shape == bias.shape == reward.shape
    # flat zero line (slope=0, bias=0) integrates to the region width
    import numpy as np
    i, j = np.unravel_index(np.argmin(slope ** 2 + bias ** 2), slope.shape)
    assert abs(reward[i, j] - 1.0) < 0.2
    assert (tmp_path / "surf.png").exists()


def test_code_instance_mat_roundtrip(tmp_path):
    import numpy as np
    from ldpc_tpu.codes import (load_code_instance, save_code_instance,
                                wifi_code)

    code = wifi_code()
    name = save_code_instance(code, tmp_path, fmt="mat")
    path = tmp_path / (name + ".mat")
    assert path.exists()
    loaded, payload = load_code_instance(path)
    assert np.array_equal(loaded.first_rows(), code.first_rows())
    # reference consumers read these exact keys (fileHandler.py:216-228)
    import scipy.io
    raw = scipy.io.loadmat(path)
    assert "parityMatrix" in raw and "fileName" in raw
    assert np.array_equal(np.atleast_2d(raw["parityMatrix"]),
                          code.to_dense())


def test_mat_load_infers_z_without_hints(tmp_path):
    """A reference-produced .mat has only a dense parityMatrix and an
    opaque SHA filename — no z anywhere.  Loading must recover z by the
    block-circulant divisor search (gcd alone is wrong: wifi rate-1/2
    gcd(972, 1944) = 972 vs z = 81; advisor r2 finding)."""
    import numpy as np
    import scipy.io

    from ldpc_tpu.codes import load_code_instance, wifi_code

    code = wifi_code(rate=0.5)
    path = tmp_path / "deadbeefcafe.mat"   # no z in the stem
    scipy.io.savemat(path, {"parityMatrix": code.to_dense(),
                            "fileName": "deadbeefcafe"})
    loaded, _ = load_code_instance(path)
    assert loaded.z == code.z == 81
    assert np.array_equal(loaded.to_dense(), code.to_dense())


def test_chain_and_frontier_figures(tmp_path):
    """The two committed chain figures regenerate from repo artifacts."""
    import importlib.util
    import os

    for script, png in [("chain_figure.py", "chain.png"),
                        ("reward_floor_frontier.py", "frontier.png")]:
        path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                            script)
        spec = importlib.util.spec_from_file_location(script[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = tmp_path / png
        mod.main(out=str(out))
        assert out.exists() and out.stat().st_size > 10_000
