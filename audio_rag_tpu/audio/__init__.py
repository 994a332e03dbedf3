from audio_rag_tpu.audio.io import decode_audio, get_duration, write_wav

__all__ = ["decode_audio", "get_duration", "write_wav"]
