from whisperjav_tpu.models.whisper.config import WhisperConfig, WHISPER_SIZES
