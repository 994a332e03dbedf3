from audio_rag_tpu.utils.logging import get_logger, setup_logging
from audio_rag_tpu.utils.decorators import logged, require_loaded, timed

__all__ = ["get_logger", "setup_logging", "timed", "logged", "require_loaded"]
