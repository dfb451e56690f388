"""Unified framework configuration.

The reference scatters configuration across module-level SCREAMING_CASE
constants (``ldpc.py:24-38``, ``ldpc_env.py:18-30``, ``ldpcCUDA.py:47-98``,
``common.py:11-17``), env vars (``LDPC``/``SWIFT`` project root,
gettingStarted.py:16-30), ``user_config.py`` and per-entry argparse.  Here
every tunable lives in one dataclass tree, overridable from environment
variables (``LDPC_TPU_<SECTION>_<FIELD>``) and JSON files.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib

__all__ = ["DecoderConfig", "SimConfig", "EnvConfig", "FrameworkConfig",
           "load_config", "save_config"]


@dataclasses.dataclass
class DecoderConfig:
    max_iters: int = 50                 # LDPC_ENV_NUMBER_OF_ITERATIONS
    kind: str = "min-sum"
    alpha: float = 0.75                 # normalized-min-sum scale
    beta: float = 0.15                  # offset-min-sum offset
    dtype: str = "float32"
    staged: bool = True
    phase1_iters: int = 12


@dataclasses.dataclass
class SimConfig:
    seed: int = 7134066                 # LDPC_LOCAL_PRNG seed, ldpc.py:24
    snr_points: tuple = (3.0, 3.2, 3.4, 3.6)   # ldpc.py:484
    num_transmissions: int = 50         # testNearEarth default
    batch_size: int = 1024


@dataclasses.dataclass
class EnvConfig:
    snr_points: tuple = (3.0, 3.2, 3.4)  # ldpc_env.py:88
    num_transmissions: int = 10          # ldpc_env.py:22
    num_iterations: int = 50
    time_budget_s: float = 640.0         # ldpc_env.py:25 (secondary guard)
    iteration_budget: int | str | None = "auto"  # primary, reproducible
    dmax_cn_cap: int = 48
    dmax_vn_cap: int = 18


@dataclasses.dataclass
class FrameworkConfig:
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    sim: SimConfig = dataclasses.field(default_factory=SimConfig)
    env: EnvConfig = dataclasses.field(default_factory=EnvConfig)
    data_dir: str = "/tmp/ldpc_tpu_experiments"

    def asdict(self) -> dict:
        return dataclasses.asdict(self)


def _apply_env(cfg: FrameworkConfig) -> FrameworkConfig:
    for section_name in ("decoder", "sim", "env"):
        section = getattr(cfg, section_name)
        for f in dataclasses.fields(section):
            var = f"LDPC_TPU_{section_name.upper()}_{f.name.upper()}"
            raw = os.environ.get(var)
            if raw is None:
                continue
            current = getattr(section, f.name)
            if isinstance(current, bool):
                value = raw.lower() in ("1", "true", "yes")
            elif isinstance(current, int):
                value = int(raw)
            elif isinstance(current, float):
                value = float(raw)
            elif isinstance(current, tuple):
                value = tuple(float(x) for x in raw.split(","))
            else:
                value = raw
            setattr(section, f.name, value)
    if os.environ.get("LDPC_TPU_DATA_DIR"):
        cfg.data_dir = os.environ["LDPC_TPU_DATA_DIR"]
    return cfg


def load_config(path=None) -> FrameworkConfig:
    """Defaults <- optional JSON file <- env var overrides."""
    cfg = FrameworkConfig()
    if path is not None and pathlib.Path(path).exists():
        doc = json.loads(pathlib.Path(path).read_text())
        for section_name in ("decoder", "sim", "env"):
            section = getattr(cfg, section_name)
            for k, v in doc.get(section_name, {}).items():
                if isinstance(v, list):
                    v = tuple(v)
                setattr(section, k, v)
        cfg.data_dir = doc.get("data_dir", cfg.data_dir)
    return _apply_env(cfg)


def save_config(cfg: FrameworkConfig, path) -> None:
    pathlib.Path(path).write_text(json.dumps(cfg.asdict(), indent=2))
