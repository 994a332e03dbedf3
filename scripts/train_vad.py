"""Train the small conv frame-VAD on synthetic speech/non-speech audio and
save the weights as a committed asset.

The reference gets learned VAD for free from Silero (inside faster-whisper,
reference ``asr/whisper.py:120-126``) and marblenet (``diarization/
nemo.py:45-100``) — pretrained checkpoints this zero-egress environment
cannot download. Instead the same *class* of model (dilated 1-D convs over
log-mel frames, :func:`audio_rag_tpu.models.speaker.vad_scores`) trains
here on a synthetic curriculum whose positive class mimics speech structure
(harmonic stacks with pitch movement and 2–8 Hz syllabic amplitude
modulation at mixed SNR) and whose negative class covers the classic energy
-gate failure modes: steady tones, broadband noise, hum, clicks — all of
which have ENERGY but are not speech. The committed weights make
``VADOptions(backend="learned")`` functional out of the box; real Silero/
marblenet weights can replace them via the same npz format when available.

Deterministic (fixed seeds, CPU). Run: python scripts/train_vad.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "audio_rag_tpu" / "assets" / "vad_small.npz"

SR = 16_000
CLIP_S = 3.0
CLIP = int(SR * CLIP_S)
N_MELS = 80
FRAMES = int(CLIP_S * 100)  # 10 ms hop


def synth_speech(rng: np.random.Generator, n: int) -> np.ndarray:
    """Harmonic stack with pitch drift + syllabic AM — speech-shaped."""
    t = np.arange(n) / SR
    f0 = rng.uniform(90, 280)
    drift = f0 * 0.15 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t)
    phase = 2 * np.pi * np.cumsum(f0 + drift) / SR
    sig = np.zeros(n)
    for h in range(1, 9):
        amp = rng.uniform(0.3, 1.0) / h
        sig += amp * np.sin(h * phase)
    # formant-ish coloration: emphasize a random band via a short FIR
    taps = np.sinc(np.linspace(-4, 4, 33)) * np.hanning(33)
    taps *= np.cos(2 * np.pi * rng.uniform(0.02, 0.2) * np.arange(33))
    sig = np.convolve(sig, taps, mode="same")
    # syllabic amplitude modulation (2–8 Hz) with pauses
    am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 8) * t +
                           rng.uniform(0, 6.28)))
    sig *= 0.2 + 0.8 * am ** rng.uniform(1.0, 2.0)
    return (sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


def synth_nonspeech(rng: np.random.Generator, n: int) -> np.ndarray:
    """Energy-bearing non-speech: noise / steady tone / hum / clicks."""
    kind = rng.integers(0, 5)
    t = np.arange(n) / SR
    if kind == 0:  # white noise
        sig = rng.standard_normal(n)
    elif kind == 1:  # pink-ish noise
        sig = np.cumsum(rng.standard_normal(n))
        sig -= np.linspace(sig[0], sig[-1], n)
    elif kind == 2:  # steady tone (no AM, no harmonics drift)
        sig = np.sin(2 * np.pi * rng.uniform(100, 4000) * t)
    elif kind == 3:  # mains hum + overtone
        sig = np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(2 * np.pi * 150 * t)
    else:  # click train
        sig = np.zeros(n)
        sig[rng.integers(0, n, size=max(n // (SR // 20), 1))] = 1.0
        sig = np.convolve(sig, np.hanning(64), mode="same")
    return (sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


def make_clip(rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """3 s clip + per-10ms-frame labels: speech spans over a noise bed."""
    audio = np.zeros(CLIP, np.float32)
    labels = np.zeros(FRAMES, np.float32)
    # background: silence or non-speech at low level
    if rng.random() < 0.7:
        audio += rng.uniform(0.005, 0.08) * synth_nonspeech(rng, CLIP)
    # 0–2 speech spans
    for _ in range(rng.integers(0, 3)):
        dur = rng.uniform(0.4, 1.6)
        start = rng.uniform(0, CLIP_S - dur)
        i0, i1 = int(start * SR), int((start + dur) * SR)
        level = rng.uniform(0.08, 0.8)
        audio[i0:i1] += level * synth_speech(rng, i1 - i0)
        labels[int(start * 100): int((start + dur) * 100)] = 1.0
    # occasional loud non-speech event (the energy-gate trap)
    if rng.random() < 0.4:
        dur = rng.uniform(0.3, 1.2)
        start = rng.uniform(0, CLIP_S - dur)
        i0, i1 = int(start * SR), int((start + dur) * SR)
        audio[i0:i1] += rng.uniform(0.2, 0.9) * synth_nonspeech(
            rng, i1 - i0)
    peak = np.abs(audio).max()
    if peak > 1.0:
        audio /= peak
    return audio, labels


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from audio_rag_tpu.models.speaker import init_vad, vad_scores
    from audio_rag_tpu.ops.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    mel_batch = jax.jit(jax.vmap(
        lambda a: log_mel_spectrogram(a, n_mels=N_MELS)
    ))

    def make_batch(n):
        clips, labels = [], []
        for _ in range(n):
            a, l = make_clip(rng)
            clips.append(a)
            labels.append(l)
        return np.stack(clips), np.stack(labels)

    params = init_vad(jax.random.PRNGKey(0), n_mels=N_MELS, channels=64)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mel, labels):
        def loss_fn(p):
            probs = vad_scores(p, mel, dtype=jnp.float32)
            probs = jnp.clip(probs[:, : labels.shape[1]], 1e-6, 1 - 1e-6)
            bce = -(labels * jnp.log(probs) +
                    (1 - labels) * jnp.log(1 - probs))
            return jnp.mean(bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(400):
        clips, labels = make_batch(32)
        mel = np.asarray(mel_batch(jnp.asarray(clips)))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(mel), jnp.asarray(labels))
        if it % 50 == 0:
            print(f"step {it}: bce {float(loss):.4f}")

    # held-out frame accuracy
    clips, labels = make_batch(64)
    mel = np.asarray(mel_batch(jnp.asarray(clips)))
    probs = np.asarray(vad_scores(params, jnp.asarray(mel),
                                  dtype=jnp.float32))[:, : FRAMES]
    acc = float(np.mean((probs > 0.5) == (labels > 0.5)))
    print(f"held-out frame accuracy: {acc:.3f}")
    assert acc > 0.85, "VAD failed to learn; not saving"

    OUT.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[name] = np.asarray(leaf)
    np.savez(OUT, **flat)
    print(f"saved {sum(v.size for v in flat.values())} params -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
