"""Experiment infrastructure (layer L5): logging, checkpoints, config,
experiment grids."""

from .logging import EpochLogger, TsvLogger, colorize, statistics_scalar
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .config import (DecoderConfig, EnvConfig, FrameworkConfig, SimConfig,
                     load_config, save_config)
from .experiment import (DEFAULT_DATA_DIR, ExperimentGrid,
                         setup_logger_kwargs)
from .profiling import ThroughputTimer, device_roofline, trace

__all__ = [
    "EpochLogger", "TsvLogger", "colorize", "statistics_scalar",
    "latest_step", "restore_checkpoint", "save_checkpoint",
    "DecoderConfig", "EnvConfig", "FrameworkConfig", "SimConfig",
    "load_config", "save_config",
    "DEFAULT_DATA_DIR", "ExperimentGrid", "setup_logger_kwargs",
    "ThroughputTimer", "device_roofline", "trace",
]
