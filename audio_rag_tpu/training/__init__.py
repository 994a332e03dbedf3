from audio_rag_tpu.training.train import (
    TrainConfig,
    make_train_step,
    whisper_param_spec,
)

__all__ = ["TrainConfig", "make_train_step", "whisper_param_spec"]
