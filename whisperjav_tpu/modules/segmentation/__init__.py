from whisperjav_tpu.modules.segmentation.base import (
    SegmentationResult, SpeechSegment, create_segmenter, group_segments,
)
