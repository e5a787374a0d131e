from pemp_tpu.config.base import (
    Config,
    DataConfig,
    GlobalConfig,
    DeviceConfig,
    TrainConfig,
    TestConfig,
    VizConfig,
    Stage1RefConfig,
    config_field,
    flatten_config,
    format_config,
    apply_overrides,
)
from pemp_tpu.config.cli import Experiment

__all__ = [
    "Config", "DataConfig", "GlobalConfig", "DeviceConfig", "TrainConfig",
    "TestConfig", "VizConfig", "Stage1RefConfig", "config_field",
    "flatten_config", "format_config", "apply_overrides", "Experiment",
]
