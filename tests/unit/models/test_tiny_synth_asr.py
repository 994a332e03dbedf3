"""The committed trained tiny ASR (``assets/asr_tiny_synth.npz``).

Closes the speech→text trained-asset loop: these tests pin that the
committed model actually transcribes the synthetic charvoice through the
REAL product transcribe path (windowing → mel → batched greedy decode →
char codec), the capability the reference gets from downloaded Whisper
checkpoints (``asr/whisper.py:55-62``)."""

from pathlib import Path

import numpy as np
import pytest

from audio_rag_tpu.audio.charvoice import SR, synth_text
from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    char_decode,
    char_encode,
)

ASSET = (Path(__file__).resolve().parents[3] / "audio_rag_tpu" / "assets"
         / "asr_tiny_synth.npz")


class TestCharCodec:
    def test_round_trip(self):
        assert char_decode(char_encode("hello world 42")) == "hello world 42"

    def test_unknown_chars_become_space(self):
        assert char_decode(char_encode("a#b")) == "a b"

    def test_ids_below_specials(self):
        st = SpecialTokens.for_dims(WHISPER_PRESETS["tiny-synth"])
        ids = char_encode("the quick brown fox 0123456789 .,!?'-:;\"")
        assert max(ids) < st.eot
        assert min(ids) > 0  # pad id never produced

    def test_specials_fit_vocab(self):
        dims = WHISPER_PRESETS["tiny-synth"]
        st = SpecialTokens.for_dims(dims)
        assert st.timestamp_base == dims.n_vocab - 1
        assert st.eot == dims.n_vocab - 9


@pytest.mark.skipif(not ASSET.exists(), reason="trained asset not built")
class TestTrainedTinySynth:
    @pytest.fixture(scope="class")
    def asr(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="tiny-synth", compute_type="float32",
            vad_filter=False, temperature_fallback=False,
        ))
        asr.load()
        yield asr
        asr.unload()

    def test_transcribes_charvoice(self, asr):
        from audio_rag_tpu.evaluation.wer import aggregate_wer

        rng = np.random.default_rng(31337)  # held out from training
        texts = ["gradient descent works", "the model learns fast 42"]
        pairs = []
        for text in texts:
            wav = synth_text(text, rng, noise_level=0.01)
            segs = asr.transcribe(wav, SR)
            assert segs, f"no output for {text!r}"
            pairs.append((text, " ".join(s.text for s in segs)))
        total = aggregate_wer(pairs)
        assert total.wer <= 0.25, pairs

    def test_multi_window_file(self, asr):
        # >6 s audio spans two windows; both decode (batched) and the
        # transcript covers both halves
        rng = np.random.default_rng(99)
        text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau")
        wav = synth_text(text, rng, noise_level=0.005)
        assert wav.size > 6 * SR
        segs = asr.transcribe(wav, SR)
        hyp = " ".join(s.text for s in segs)
        ref_words = set(text.split())
        hyp_words = set(hyp.split())
        # window-boundary words may split; most words must survive
        assert len(ref_words & hyp_words) >= len(ref_words) * 0.6, hyp

    def test_empty_audio(self, asr):
        assert asr.transcribe(np.zeros(100, np.float32), SR) in ([],)
