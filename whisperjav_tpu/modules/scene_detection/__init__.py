from whisperjav_tpu.modules.scene_detection.base import (
    Scene, SceneDetectionResult, SceneDetector, create_scene_detector,
)
