"""Streaming-session mux: concurrent sessions' chunks share one batched
dispatch, with per-chunk results identical to the unbatched path.

The capability under test exceeds the reference, which serves one
streaming session at a time behind a process lock (reference
``api/v1/streaming.py:26-230``)."""

import threading

import numpy as np
import pytest

from audio_rag_tpu.asr.fake import FakeASR
from audio_rag_tpu.asr.mux import StreamingMux
from audio_rag_tpu.asr.streaming import StreamingASR, StreamingConfig
from audio_rag_tpu.audio.synth import speech_like
from audio_rag_tpu.config.schema import ASRConfig

SR = 16000


class TestMuxWithFakeBackend:
    def test_results_match_per_chunk_transcribe(self):
        backend = FakeASR()
        mux = StreamingMux(backend, max_batch=4)
        try:
            chunks = [speech_like(SR + 100 * i, SR, seed=i)
                      for i in range(6)]
            futs = [mux.submit(c, SR) for c in chunks]
            got = [f.result(timeout=30) for f in futs]
            want = [backend.transcribe(c, SR) for c in chunks]
            for g, w in zip(got, want):
                assert [s.text for s in g] == [s.text for s in w]
            assert mux.chunks_served == 6
        finally:
            mux.stop()

    def test_concurrent_sessions_batch(self):
        """Chunks submitted from N threads coalesce into fewer batches."""
        backend = FakeASR()
        done = threading.Event()
        orig = backend.transcribe_chunk_batch
        calls = []

        def slow_batch(chunks, *a, **kw):
            calls.append(len(chunks))
            done.wait(0.05)  # hold the dispatch so submitters accumulate
            return orig(chunks, *a, **kw)

        backend.transcribe_chunk_batch = slow_batch
        mux = StreamingMux(backend, max_batch=8)
        try:
            chunk = speech_like(SR, SR, seed=0)
            futs = [mux.submit(chunk, SR) for _ in range(8)]
            [f.result(timeout=30) for f in futs]
            assert mux.chunks_served == 8
            # first dispatch takes whatever was queued; the in-flight
            # 50 ms window lets the rest accumulate into one batch
            assert mux.batches_run < 8, f"no batching happened: {calls}"
        finally:
            mux.stop()

    def test_linger_coalesces_staggered_arrivals(self):
        """Arrivals skewed by less than the linger window ride ONE batch
        even when the mux is idle — the single host CPU resumes woken
        sessions one at a time, so without linger the first resubmission
        would ship alone at the full padded-dispatch price."""
        backend = FakeASR()
        mux = StreamingMux(backend, max_batch=8, linger_ms=80.0)
        try:
            chunk = speech_like(SR, SR, seed=0)
            futs = []
            for _ in range(4):  # stagger within the linger window
                futs.append(mux.submit(chunk, SR))
                threading.Event().wait(0.01)
            [f.result(timeout=30) for f in futs]
            assert mux.chunks_served == 4
            assert mux.batches_run == 1, "staggered arrivals split batches"
        finally:
            mux.stop()

    def test_mixed_keys_all_served(self):
        backend = FakeASR()
        mux = StreamingMux(backend, max_batch=4)
        try:
            chunk = speech_like(SR, SR, seed=0)
            futs = [mux.submit(chunk, SR, word_timestamps=(i % 2 == 0))
                    for i in range(6)]
            results = [f.result(timeout=30) for f in futs]
            assert all(r for r in results)
        finally:
            mux.stop()

    def test_mixed_languages_share_one_batch(self):
        """Language is NOT a batch key: the language prompt token is a
        runtime array, so sessions with different sticky languages ride
        ONE dispatch (splitting them would double per-chunk latency for
        multilingual serving)."""
        backend = FakeASR()
        mux = StreamingMux(backend, max_batch=4, linger_ms=80.0)
        try:
            chunk = speech_like(SR, SR, seed=0)
            futs = [mux.submit(chunk, SR, language=lang)
                    for lang in ("en", "de", None, "fr")]
            results = [f.result(timeout=30) for f in futs]
            assert all(r for r in results)
            assert mux.batches_run == 1, \
                "different languages must not split batches"
        finally:
            mux.stop()

    def test_stop_fails_pending(self):
        backend = FakeASR()
        mux = StreamingMux(backend)
        mux.stop()
        with pytest.raises(RuntimeError):
            mux.submit(np.zeros(SR, np.float32), SR)


class TestChunkBatchEquivalence:
    """WhisperJaxASR.transcribe_chunk_batch must equal per-chunk
    transcribe(): greedy decode is row-independent, so batching and
    pow-2 padding cannot change any row's tokens or word times."""

    @pytest.fixture(scope="class")
    def backend(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR

        b = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32",
            temperature_fallback=False, vad_filter=False,
        ))
        b.load()
        yield b
        b.unload()

    def test_batched_equals_individual(self, backend):
        # test-preset window is 1.2 s; chunks must fit one window
        chunks = [speech_like(int(SR * 1.1), SR, seed=i) for i in range(3)]
        batched = backend.transcribe_chunk_batch(
            chunks, SR, word_timestamps=True)
        for c, got in zip(chunks, batched):
            want = backend.transcribe(c, SR, word_timestamps=True)
            assert [s.text for s in got] == [s.text for s in want]
            got_words = [(w.text, w.start, w.end)
                         for s in got for w in s.words]
            want_words = [(w.text, w.start, w.end)
                          for s in want for w in s.words]
            assert got_words == want_words

    def test_empty_and_silent_rows(self, backend):
        chunks = [np.zeros(0, np.float32),
                  speech_like(int(SR * 1.0), SR, seed=7)]
        out = backend.transcribe_chunk_batch(chunks, SR)
        assert out[0] == []
        assert isinstance(out[1], list)

    def test_vad_on_matches_per_chunk_spans(self):
        """With the VAD gate on, batch rows are the speech SPANS (sliced,
        offset-carrying) exactly like transcribe() — not the whole chunk
        with t0=0."""
        from audio_rag_tpu.asr.vad import VADOptions, speech_segments
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR

        b = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32",
            temperature_fallback=False, vad_filter=True,
            vad_backend="energy",
        ))
        b.load()
        try:
            # speech / 1.4 s silence / speech → genuinely two spans
            # (min_silence 500 ms + 300 ms hangover padding need a gap
            # well past 0.8 s); plus a leading-silence chunk whose span
            # must carry its true offset
            two = np.concatenate([
                speech_like(int(SR * 0.4), SR, seed=1),
                np.zeros(int(SR * 1.4), np.float32),
                speech_like(int(SR * 0.4), SR, seed=2),
            ])
            assert len(speech_segments(two, SR, VADOptions(
                backend="energy"))) == 2, "fixture must be two spans"
            lead = np.concatenate([
                np.zeros(int(SR * 0.5), np.float32),
                speech_like(int(SR * 0.5), SR, seed=3),
            ])
            for chunk in (two, lead):
                got = b.transcribe_chunk_batch([chunk], SR)[0]
                want = b.transcribe(chunk, SR)
                assert [(s.text, s.start, s.end) for s in got] == \
                    [(s.text, s.start, s.end) for s in want]
            assert b.transcribe_chunk_batch([lead], SR)[0][0].start > 0.3

            # bounded program set: pad_to=1 (what the mux passes for a
            # single-chunk round) collapses the two spans to the envelope
            # truncated at one model window — one row, true offset kept,
            # non-empty transcript
            env = b.transcribe_chunk_batch([two], SR, pad_to=1)[0]
            assert env, "envelope collapse dropped the transcript"
            window_s = 2 * b.dims.n_audio_ctx * 160 / SR
            spans = speech_segments(two, SR, VADOptions(backend="energy"))
            assert abs(env[0].start - spans[0][0]) < 0.05
            assert env[-1].end <= spans[0][0] + window_s + 0.05
        finally:
            b.unload()


class TestPerRowLanguage:
    """Muxed batches carry per-row languages: rows are different
    sessions' audio, so one batch-wide detection would let session A's
    language stick to session B permanently (the round-3 review bug)."""

    @pytest.fixture(scope="class")
    def backend(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR

        b = WhisperJaxASR(ASRConfig(
            model_size="test-ml", compute_type="float32",
            temperature_fallback=False, vad_filter=False,
        ))
        b.load()
        yield b
        b.unload()

    def test_detect_rows_is_row_wise(self, backend):
        a = speech_like(int(SR * 1.0), SR, seed=10)
        b_ = speech_like(int(SR * 1.0), SR, seed=11)
        ab = backend.detect_language_rows([a, b_], pad_to=2)
        ba = backend.detect_language_rows([b_, a], pad_to=2)
        assert ab == [ba[1], ba[0]], \
            "detection must be a function of each row's own audio"

    def test_batch_language_matches_per_chunk(self, backend):
        a = speech_like(int(SR * 1.0), SR, seed=10)
        b_ = speech_like(int(SR * 1.0), SR, seed=11)
        got = backend.transcribe_chunk_batch([a, b_], SR, pad_to=2)
        for chunk, segs in zip((a, b_), got):
            want = backend.transcribe(chunk, SR)
            if segs and want:
                assert segs[0].language == want[0].language

    def test_mixed_fixed_languages_match_per_chunk(self, backend):
        """A per-chunk language LIST batches sessions with different
        sticky languages into one dispatch, each row keeping its own
        language token (per-chunk transcribe parity)."""
        a = speech_like(int(SR * 1.0), SR, seed=10)
        b_ = speech_like(int(SR * 1.0), SR, seed=11)
        got = backend.transcribe_chunk_batch(
            [a, b_], SR, language=["en", "de"], pad_to=2)
        for chunk, lang, segs in zip((a, b_), ("en", "de"), got):
            want = backend.transcribe(chunk, SR, language=lang)
            assert [(s.text, s.language) for s in segs] == \
                [(s.text, s.language) for s in want]

    def test_session_language_sticks_from_own_audio(self, backend):
        mux = StreamingMux(backend, max_batch=2)
        mux.warmed = True  # programs compiled by the tests above
        try:
            cfg = ASRConfig(model_size="test-ml", compute_type="float32",
                            temperature_fallback=False, vad_filter=False)
            sess = StreamingASR(
                cfg, StreamingConfig(chunk_duration=1.0,
                                     overlap_duration=0.2), mux=mux)
            sess.load()
            audio = speech_like(SR * 3, SR, seed=12)
            results = list(sess.process_stream(audio, SR))
            assert results
            assert sess._session_lang is not None
        finally:
            mux.stop()


class TestStreamingSessionWithMux:
    def test_session_replay_matches_unmuxed(self):
        cfg = ASRConfig(backend="fake")
        stream_cfg = StreamingConfig(chunk_duration=2.0,
                                     overlap_duration=0.5)
        plain = StreamingASR(cfg, stream_cfg, backend=FakeASR(cfg))
        plain.load()
        audio = speech_like(SR * 5, SR, seed=3)
        want = [(r.text, r.start, r.end)
                for r in plain.process_stream(audio, SR)]
        plain.unload()

        mux = StreamingMux(FakeASR(cfg))
        try:
            sess = StreamingASR(cfg, stream_cfg, mux=mux)
            sess.load()
            got = [(r.text, r.start, r.end)
                   for r in sess.process_stream(audio, SR)]
            sess.unload()  # must NOT unload the shared backend
            assert mux.backend.is_loaded
            assert got == want
        finally:
            mux.stop()

    def test_two_sessions_share_one_mux(self):
        cfg = ASRConfig(backend="fake")
        stream_cfg = StreamingConfig(chunk_duration=1.0,
                                     overlap_duration=0.2)
        mux = StreamingMux(FakeASR(cfg))
        try:
            sessions = [StreamingASR(cfg, stream_cfg, mux=mux)
                        for _ in range(2)]
            for s in sessions:
                s.load()
            audio = speech_like(SR * 3, SR, seed=5)
            outs: list[list] = [None, None]

            def run(i):
                outs[i] = list(sessions[i].process_stream(audio, SR))

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(2)]
            [t.start() for t in threads]
            [t.join(timeout=60) for t in threads]
            assert outs[0] and outs[1]
            # identical input through identical sessions → identical text
            assert [r.text for r in outs[0]] == [r.text for r in outs[1]]
            assert mux.chunks_served >= 2
        finally:
            mux.stop()
