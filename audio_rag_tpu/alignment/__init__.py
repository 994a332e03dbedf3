from audio_rag_tpu.alignment.aligner import (
    align_words_to_speakers,
    build_speaker_transcript,
)

__all__ = ["align_words_to_speakers", "build_speaker_transcript"]
