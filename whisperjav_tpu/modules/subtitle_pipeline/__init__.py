from whisperjav_tpu.modules.subtitle_pipeline.types import (
    AlignmentResult, FramingResult, HardeningConfig, SceneDiagnostics,
    StepDownConfig, TemporalFrame, TimestampMode, TranscriptionResult,
    WordTimestamp,
)
from whisperjav_tpu.modules.subtitle_pipeline.orchestrator import (
    DecoupledSubtitlePipeline,
)
