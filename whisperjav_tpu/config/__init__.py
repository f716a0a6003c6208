from whisperjav_tpu.config.presets import (
    ModePreset, SensitivityPreset, resolve_pipeline_config,
)
