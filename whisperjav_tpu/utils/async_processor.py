"""Multi-file processing with host-side I/O parallelism.

Role-adapted from the reference's AsyncPipelineManager (reference:
whisperjav/utils/async_processor.py:1-5 — a ThreadPoolExecutor over whole
pipelines, GPU still serialized). On TPU the right split is different:
the DEVICE work is already batched inside one engine, so threads are only
useful for the HOST stages (decode WAV, scene detection, VAD). This
manager overlaps host preprocessing of file N+1 with device decode of
file N via a two-stage pipeline, with cooperative cancellation.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, List, Optional, Sequence

from whisperjav_tpu.modules.media_discovery import MediaInfo
from whisperjav_tpu.utils.logger import logger


@dataclass
class FileOutcome:
    media: MediaInfo
    ok: bool
    result: object = None
    error: Optional[str] = None


class AsyncPipelineManager:
    """Overlap host preprocessing with device decoding across files."""

    def __init__(self, pipeline, max_prefetch: int = 2):
        self.pipeline = pipeline
        self.max_prefetch = max_prefetch
        self._cancel = threading.Event()

    def cancel(self) -> None:
        self._cancel.set()

    # ------------------------------------------------------------------
    def process_files(self, media: Sequence[MediaInfo],
                      output_dir: Path,
                      on_complete: Optional[Callable] = None) -> List[FileOutcome]:
        from whisperjav_tpu.modules.audio_io import WHISPER_SAMPLE_RATE
        from whisperjav_tpu.modules.audio_extraction import AudioExtractor

        prep_q: "queue.Queue" = queue.Queue(maxsize=self.max_prefetch)
        extractor = AudioExtractor(WHISPER_SAMPLE_RATE)

        def producer():
            for m in media:
                if self._cancel.is_set():
                    break
                try:
                    audio, _ = extractor.extract(m.path)
                    windows, stats = self.pipeline.collect_windows(
                        audio, WHISPER_SAMPLE_RATE)
                    prep_q.put((m, windows, stats, None))
                except Exception as e:  # noqa: BLE001 — keep batch going
                    prep_q.put((m, None, None, str(e)))
            prep_q.put(None)   # sentinel

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        outcomes: List[FileOutcome] = []
        while True:
            item = prep_q.get()
            if item is None:
                break
            m, windows, stats, err = item
            if self._cancel.is_set():
                outcomes.append(FileOutcome(m, False, error="cancelled"))
                continue
            if err is not None:
                logger.error("preprocessing failed on %s: %s",
                             m.path.name, err)
                outcomes.append(FileOutcome(m, False, error=err))
                continue
            try:
                result = self._decode_and_write(m, windows, stats, output_dir)
                outcomes.append(FileOutcome(m, True, result=result))
                if on_complete:
                    on_complete(m, result)
            except Exception as e:  # noqa: BLE001
                logger.error("decode failed on %s: %s", m.path.name, e)
                outcomes.append(FileOutcome(m, False, error=str(e)))
        t.join(timeout=5.0)
        return outcomes

    # ------------------------------------------------------------------
    def _decode_and_write(self, media: MediaInfo, windows, stats,
                          output_dir: Path):
        from whisperjav_tpu.modules.srt import save_srt

        results = self.pipeline.engine.transcribe_windows(windows)
        # shared assembly path: packing/chunking reconciliation and window
        # diagnostics stay identical to the sync pipeline
        subtitles = self.pipeline.assemble_subtitles(results)
        if self.pipeline.postprocessor is not None:
            subtitles, _ = self.pipeline.postprocessor.process(
                subtitles, language=self.pipeline.language)
        from whisperjav_tpu.modules.media_discovery import resolve_output_dir
        output_dir = resolve_output_dir(output_dir, media)
        output_dir.mkdir(parents=True, exist_ok=True)
        srt_path = output_dir / (
            f"{media.basename}.{self.pipeline.language}.whisperjav.srt")
        save_srt(srt_path, subtitles)
        return srt_path
