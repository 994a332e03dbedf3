"""Voice activity detection: learned conv VAD (device) + energy gate (host).

Replaces the Silero VAD filter faster-whisper applies before transcription
(reference ``asr/whisper.py:120-126`` with ``vad_filter=True``) and the
marblenet gate in the diarization path (reference
``diarization/nemo.py:45-100``).

Two backends behind one option surface:

* ``learned`` — the dilated-conv frame VAD
  (:func:`audio_rag_tpu.models.speaker.vad_scores`) over 10 ms log-mel
  frames, batched over 3 s windows on device. Weights ship as a committed
  asset trained by ``scripts/train_vad.py`` on a synthetic curriculum whose
  negative class covers the energy gate's failure modes (steady tones,
  broadband noise, hum, clicks); real Silero/marblenet-class weights can
  replace the npz when available. Boundary fidelity is what BASELINE.md
  gates on — an energy threshold cannot reproduce learned boundaries.
* ``energy`` — frame RMS with hysteresis; dependency-free host fallback.

``auto`` uses the learned backend when its weights load and the audio is
16 kHz, else energy. Span post-processing (min-speech, hangover padding,
min-silence merging) is shared, so switching backends changes only the
frame decisions.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

__all__ = ["VADOptions", "energy_vad", "learned_vad", "speech_segments",
           "speech_segments_batch"]

_SR = 16_000
_WINDOW_S = 3.0  # must match scripts/train_vad.py CLIP_S (mel global-norm
_WINDOW = int(_SR * _WINDOW_S)  # window is part of the model's input law)
_FRAMES_PER_WINDOW = int(_WINDOW_S * 100)
#: batch-size buckets per dispatch. Host↔device interaction COUNT is the
#: latency model on this relay (~28 ms flat + congestion-variable for
#: tens-of-MB operands): batch 16 cost 150 dispatches / ~24 s warm on a
#: 2-hour file; 128-window dispatches cut that to 19. The small buckets
#: keep short inputs (a 5 s streaming chunk = 2 windows) from paying a
#: 128x3 s padded program; each bucket compiles once, persistently cached.
_BATCHES = (8, 32, 128)


@dataclass
class VADOptions:
    frame_ms: int = 30
    threshold_db: float = -38.0  # energy backend: speech if dBFS above
    threshold: float = 0.5  # learned backend: speech if P(speech) above
    hangover_frames: int = 10  # keep speech active this many frames after
    min_speech_ms: int = 250
    min_silence_ms: int = 500
    #: "auto" | "learned" | "energy"
    backend: str = "energy"


def energy_vad(
    audio: np.ndarray, sr: int = 16000, opts: VADOptions | None = None
) -> np.ndarray:
    """Raw per-frame speech flags (bool) at ``frame_ms`` granularity
    (no hangover — smoothing happens in :func:`speech_segments`)."""
    opts = opts or VADOptions()
    frame = int(sr * opts.frame_ms / 1000)
    n = len(audio) // frame
    if n == 0:
        return np.zeros(0, bool)
    x = audio[: n * frame].reshape(n, frame).astype(np.float64)
    rms = np.sqrt(np.mean(x * x, axis=1) + 1e-12)
    db = 20.0 * np.log10(rms + 1e-12)
    return db > opts.threshold_db


# -- learned backend ---------------------------------------------------------

_learned_runner = None  # None = not tried, False = unavailable


def _nest(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _get_learned_runner():
    """Lazily build the jitted (B, window) → (B, frames) probability fn."""
    global _learned_runner
    if _learned_runner is not None:
        return _learned_runner
    path = Path(__file__).resolve().parents[1] / "assets" / "vad_small.npz"
    if not path.exists():
        _learned_runner = False
        return False
    try:
        import jax
        import jax.numpy as jnp

        from audio_rag_tpu.models.speaker import vad_scores
        from audio_rag_tpu.ops.mel import log_mel_spectrogram

        with np.load(path) as data:
            params = _nest({k: jnp.asarray(data[k]) for k in data.files})

        @jax.jit
        def run(clips):  # (B, _WINDOW) f32
            mel = jax.vmap(
                lambda a: log_mel_spectrogram(a, n_mels=80)
            )(clips)
            return vad_scores(params, mel, dtype=jnp.float32)

        _learned_runner = run
    except Exception:  # pragma: no cover - asset/backend problems
        _learned_runner = False
    return _learned_runner


def _run_windows(clips_all: np.ndarray) -> np.ndarray:
    """All (n, _WINDOW) clips through the jitted runner in bucketed
    dispatches → per-window (n, _FRAMES_PER_WINDOW) probabilities.
    Windows are independent to the model, so callers may stack windows
    from MANY audios into one call — interaction count, not window
    count, is the latency model on this relay."""
    run = _get_learned_runner()
    import jax.numpy as jnp

    n_windows = len(clips_all)
    probs = np.zeros((n_windows, _FRAMES_PER_WINDOW), np.float32)
    base = 0
    while base < n_windows:
        rem = n_windows - base
        batch = next((b for b in _BATCHES if rem <= b), _BATCHES[-1])
        m = min(batch, rem)
        if m == batch:
            clips = clips_all[base: base + batch]
        else:  # tail shorter than the smallest fitting bucket: pad
            clips = np.zeros((batch, _WINDOW), np.float32)
            clips[:m] = clips_all[base: base + m]
        out = np.asarray(run(jnp.asarray(clips)))
        probs[base: base + m] = out[:m, :_FRAMES_PER_WINDOW]
        base += m
    return probs


def _window_clips(audio: np.ndarray) -> np.ndarray:
    n_windows = (len(audio) + _WINDOW - 1) // _WINDOW
    padded = np.zeros(n_windows * _WINDOW, np.float32)
    padded[: len(audio)] = audio
    return padded.reshape(n_windows, _WINDOW)


def learned_vad(
    audio: np.ndarray, sr: int = 16000, opts: VADOptions | None = None
) -> np.ndarray | None:
    """Per-10ms-frame speech flags from the learned conv VAD, or None when
    the backend is unavailable (missing asset / non-16kHz audio)."""
    opts = opts or VADOptions()
    if sr != _SR:
        return None
    if not _get_learned_runner():
        return None
    n_frames = len(audio) // (_SR // 100)
    if n_frames == 0:
        return np.zeros(0, bool)
    probs = _run_windows(_window_clips(audio)).reshape(-1)
    return probs[:n_frames] > opts.threshold


def _spans_from_flags(
    flags: np.ndarray, frame_s: float, opts: VADOptions
) -> list[tuple[float, float]]:
    """Flags → merged spans: raw spans → drop shorter than min_speech_ms
    (before padding, so hangover can't promote blips) → pad ends by the
    hangover → merge spans separated by < min_silence_ms."""
    spans: list[tuple[float, float]] = []
    start = None
    for i, f in enumerate(flags):
        if f and start is None:
            start = i * frame_s
        elif not f and start is not None:
            spans.append((start, i * frame_s))
            start = None
    if start is not None:
        spans.append((start, len(flags) * frame_s))
    spans = [
        (s, e) for s, e in spans if (e - s) >= opts.min_speech_ms / 1000.0
    ]
    total = len(flags) * frame_s
    pad = opts.hangover_frames * frame_s
    merged: list[tuple[float, float]] = []
    for s, e in spans:
        e = min(e + pad, total)
        if merged and s - merged[-1][1] < opts.min_silence_ms / 1000.0:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def speech_segments(
    audio: np.ndarray, sr: int = 16000, opts: VADOptions | None = None
) -> list[tuple[float, float]]:
    """Merged (start_s, end_s) speech spans via the configured backend."""
    opts = opts or VADOptions()
    if opts.backend in ("learned", "auto"):
        flags = learned_vad(audio, sr, opts)
        if flags is not None:
            return _spans_from_flags(flags, 0.01, opts)
        # graceful degradation: fall through to the energy gate
    flags = energy_vad(audio, sr, opts)
    if flags.size == 0:
        return []
    return _spans_from_flags(flags, opts.frame_ms / 1000.0, opts)


def speech_segments_batch(
    audios: list[np.ndarray], sr: int = 16000,
    opts: VADOptions | None = None,
) -> list[list[tuple[float, float]]]:
    """Spans for MANY audios with the learned VAD's windows stacked into
    one bucketed dispatch set — results identical to per-audio
    :func:`speech_segments` (windows are independent to the model).

    The streaming-mux path (``whisper_jax.transcribe_chunk_batch``)
    gates N sessions' chunks per round: per-chunk calls would pay N
    ~30 ms host↔device interactions serialized on the mux thread; a 5 s
    chunk is 2 windows, so N=8 chunks fit ONE 16-window dispatch."""
    opts = opts or VADOptions()
    use_learned = (
        opts.backend in ("learned", "auto")
        and sr == _SR
        and bool(_get_learned_runner())
    )
    if not use_learned:
        return [speech_segments(a, sr, opts) for a in audios]
    metas = []  # (n_frames, n_windows) per audio
    clip_list = []
    for a in audios:
        n_frames = len(a) // (_SR // 100)
        n_windows = (len(a) + _WINDOW - 1) // _WINDOW if n_frames else 0
        metas.append((n_frames, n_windows))
        if n_windows:
            clip_list.append(_window_clips(a))
    probs = (_run_windows(np.concatenate(clip_list))
             if clip_list else np.zeros((0, _FRAMES_PER_WINDOW)))
    out: list[list[tuple[float, float]]] = []
    base = 0
    for n_frames, n_windows in metas:
        if not n_frames:
            out.append([])
            continue
        flags = probs[base: base + n_windows].reshape(-1)[:n_frames] \
            > opts.threshold
        out.append(_spans_from_flags(flags, 0.01, opts))
        base += n_windows
    return out
