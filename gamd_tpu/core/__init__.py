from gamd_tpu.core import space, units
from gamd_tpu.core.config import (
    MDConfig,
    ModelConfig,
    SystemConfig,
    TrainConfig,
    PRESETS,
    get_preset,
)

__all__ = [
    "space",
    "units",
    "MDConfig",
    "ModelConfig",
    "SystemConfig",
    "TrainConfig",
    "PRESETS",
    "get_preset",
]
