"""Tests for utils: config, experiment grid, loggers, CLI."""

import json
import os

import numpy as np
import pytest

from ldpc_tpu.utils import (EpochLogger, ExperimentGrid, FrameworkConfig,
                            TsvLogger, load_config, save_config,
                            setup_logger_kwargs, statistics_scalar)


def test_setup_logger_kwargs_convention(tmp_path):
    kw = setup_logger_kwargs("exp", seed=3, data_dir=str(tmp_path))
    assert kw["output_dir"].endswith("exp/exp_s3")
    kw2 = setup_logger_kwargs("exp", data_dir=str(tmp_path))
    assert kw2["output_dir"].endswith("exp")


def test_experiment_grid_variants_and_names():
    g = ExperimentGrid("sweep")
    g.add("seed", [0, 1], in_name=True)
    g.add("lr", [1e-3])
    vs = g.variants()
    assert len(vs) == 2
    assert vs[0] == {"seed": 0, "lr": 1e-3}
    assert "see-0" in g.variant_name(vs[0])


def test_experiment_grid_run(tmp_path):
    g = ExperimentGrid("t").add("seed", [0, 1])
    calls = []
    g.run(lambda output_dir, exp_name, seed: calls.append((seed, exp_name)),
          data_dir=str(tmp_path))
    assert [c[0] for c in calls] == [0, 1]


def test_config_roundtrip_and_env_override(tmp_path, monkeypatch):
    cfg = FrameworkConfig()
    cfg.decoder.max_iters = 25
    save_config(cfg, tmp_path / "c.json")
    loaded = load_config(tmp_path / "c.json")
    assert loaded.decoder.max_iters == 25
    monkeypatch.setenv("LDPC_TPU_DECODER_MAX_ITERS", "7")
    monkeypatch.setenv("LDPC_TPU_SIM_SNR_POINTS", "2.0,2.5")
    loaded = load_config(tmp_path / "c.json")
    assert loaded.decoder.max_iters == 7
    assert loaded.sim.snr_points == (2.0, 2.5)


def test_tsv_logger(tmp_path):
    t = TsvLogger(["a", "b"], path=tmp_path / "x.tsv", print_rows=False)
    t.log(a=1, b="x")
    t.log(a=2.5)
    lines = (tmp_path / "x.tsv").read_text().splitlines()
    assert lines[0] == "a\tb" and lines[1] == "1\tx" and lines[2] == "2.5\t"


def test_epoch_logger_stats(tmp_path, capsys):
    lg = EpochLogger(output_dir=tmp_path)
    for v in (1.0, 2.0, 3.0):
        lg.store(X=v)
    lg.log_tabular("Epoch", 0)
    lg.log_tabular("X", with_min_and_max=True)
    lg.dump_tabular()
    out = capsys.readouterr().out
    assert "AverageX" in out and "MaxX" in out
    assert (tmp_path / "progress.txt").read_text().count("\n") == 2
    lg.close()


def test_statistics_scalar():
    m, s, lo, hi = statistics_scalar([1.0, 2.0, 3.0], with_min_and_max=True)
    assert m == 2.0 and lo == 1.0 and hi == 3.0


def test_cli_probe_and_getting_started(capsys):
    from ldpc_tpu.cli import main
    main(["probe", "--code", "wifi", "--flips", "0", "--iterations", "10"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["success"] and out["errors_decoded"] == 0
    main(["getting-started"])
    out = capsys.readouterr().out
    assert "decoder smoke test" in out and "OK" in out


def test_cli_perturb(tmp_path, capsys):
    from ldpc_tpu.cli import main
    main(["perturb", "--code", "wifi", "--out", str(tmp_path)])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["written"] == 4 * 24


def test_cli_evaluate_sharded(capsys):
    """--sharded routes through the mesh evaluator (psum counter merge,
    the reference's evaluateCodeCudaWrapper numberOfCudaDevices path)."""
    from ldpc_tpu.cli import main
    main(["evaluate", "--code", "wifi", "--snr", "4.0",
          "--transmissions", "8", "--iterations", "8",
          "--batch-size", "8", "--sharded"])
    out = capsys.readouterr()
    summary = json.loads(out.out.strip().splitlines()[-1])
    assert summary["transmissions"] >= 8
    assert summary["ber"][0] <= 1e-2


def test_bounded_cache_lru():
    from ldpc_tpu.utils.cache import BoundedCache
    c = BoundedCache(maxsize=2)
    c["a"] = 1
    c["b"] = 2
    assert c.get("a") == 1          # refreshes recency of "a"
    c["c"] = 3                      # evicts "b" (least recently used)
    assert "b" not in c and c["a"] == 1 and c["c"] == 3
    assert len(c) == 2
    assert c.get("missing") is None
