"""Default qwen-mode pipeline builder shared by the serve daemon.

The CLI's qwen branch (cli.py) supports ~25 deep knobs (framer/generator/
cleaner/aligner swaps, step-down tuning, context prompts…). This factory
builds the DEFAULT stack those knobs collapse to when unset — vad-grouped
framer under the mode's VAD backend, QwenGenerator, passthrough cleaner,
qwen3 NAR aligner, standard regroup, step-down enabled — driven purely by
the resolved ``PipelineConfig``. That is exactly the surface the
resident-engine fingerprint covers (mode/sensitivity/model/language/
batch_size, pipelines/daemon_client.py), so a daemon built here is a
faithful stand-in for a flagless ``whisperjav --mode qwen`` invocation;
the CLI refuses to daemon-route invocations that set deep qwen knobs.

Reference whole-path: whisperjav/pipelines/qwen_pipeline.py:87-1056.
"""

from __future__ import annotations

from typing import Optional

from whisperjav_tpu.pipelines.qwen import QwenPipeline


def build_qwen_pipeline(cfg, checkpoint: Optional[str] = None) -> QwenPipeline:
    from whisperjav_tpu.modules.subtitle_pipeline.components import (
        QwenGenerator, create_aligner, create_cleaner, create_framer,
    )
    from whisperjav_tpu.modules.subtitle_pipeline.orchestrator import (
        DecoupledSubtitlePipeline,
    )
    from whisperjav_tpu.modules.subtitle_pipeline.types import (
        RegroupMode, StepDownConfig,
    )

    model_size = (cfg.model if cfg.model.startswith("qwen")
                  else "qwen3-asr-1.7b")
    framer_kwargs = {"vad_backend": cfg.mode.vad_backend}
    if cfg.vad_kwargs:
        framer_kwargs.update(cfg.vad_kwargs)
    decoupled = DecoupledSubtitlePipeline(
        framer=create_framer("vad-grouped", **framer_kwargs),
        generator=QwenGenerator(model_size=model_size,
                                batch_size=cfg.batch_size,
                                checkpoint=checkpoint),
        cleaner=create_cleaner("assembly"),
        aligner=create_aligner("qwen3"),
        max_group_s=cfg.sensitivity.max_group_duration_s,
        step_down=StepDownConfig(enabled=True),
        regroup_mode=RegroupMode.STANDARD,
    )
    return QwenPipeline(
        decoupled,
        scene_backend=cfg.mode.scene_backend,
        scene_kwargs=cfg.scene_kwargs or None,
        enhancer_backend=cfg.enhancer_backend,
        language=cfg.language,
    )
