"""Train the small FastSpeech-class TTS on a synthetic deterministic voice
and save the weights as a committed asset.

The reference gets TTS from external engines (piper's pretrained VITS,
``tts/piper.py``; Microsoft's edge-tts service, ``tts/edge.py``) — neither
binaries nor checkpoints are reachable from this zero-egress environment.
Instead the same *class* of model (non-autoregressive text→mel with a
duration predictor, :mod:`audio_rag_tpu.models.tts`) trains here on a
synthetic "charvoice": every symbol has a fixed spectral identity (vowels =
harmonic stacks at per-vowel pitch with a formant band, consonants =
per-symbol narrow-band tones + noise, digits = DTMF-ish dual tones) and a
fixed duration class. The trained asset makes ``TTSConfig(backend="jax")``
produce audible, per-character-faithful speech-like audio out of the box,
and real FastSpeech/VITS-class weights can replace it through the same npz
format + converter when available.

Checks before saving (the "did it learn" gate):
* held-out duration prediction within ±1 frame for ≥95% of symbols
* per-vowel spectral identity: synthesizing a lone vowel yields a dominant
  mel band within 2 bins of the charvoice target

Deterministic (fixed seeds, CPU). Run: python scripts/train_tts.py
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
OUT = REPO / "audio_rag_tpu" / "assets" / "tts_small.npz"

from audio_rag_tpu.audio.charvoice import (  # noqa: E402  (path setup above)
    HOP,
    SR,
    VOWELS,
    char_band,
    char_duration,
    synth_char,
)  # the shared deterministic voice (also the ASR training teacher)

N_MELS = 80

# training buckets (position tables are computed, not learned, so the asset
# serves any max_text/max_frames at inference)
TRAIN_TEXT = 64
TRAIN_FRAMES = 448


_WORD_CHARS = "abcdefghijklmnopqrstuvwxyz"


def make_text(rng: np.random.Generator) -> str:
    if rng.random() < 0.15:
        # short texts (lone chars / short words) keep single-symbol
        # synthesis in-distribution — the backend serves arbitrary input
        n = int(rng.integers(1, 4))
        return "".join(rng.choice(list(_WORD_CHARS + "aeiou"), n))
    words = []
    budget = rng.integers(12, TRAIN_TEXT - 4)
    while sum(len(w) + 1 for w in words) < budget:
        n = int(rng.integers(2, 8))
        if rng.random() < 0.12:
            words.append("".join(rng.choice(list("0123456789"), n)))
        else:
            words.append("".join(rng.choice(list(_WORD_CHARS), n)))
    text = " ".join(words)[: TRAIN_TEXT - 1]
    if rng.random() < 0.3:
        text = text + rng.choice(list(".,!?"))
    return text


def make_sample(rng, text_to_ids, log_mel):
    """One (tokens, durations, mel target, frame_valid) training sample."""
    import jax.numpy as jnp

    text = make_text(rng)
    toks = text_to_ids(text, TRAIN_TEXT)
    durs = np.zeros(TRAIN_TEXT, np.int32)
    pieces = []
    for i, c in enumerate(text):
        durs[i] = char_duration(c)
        pieces.append(synth_char(c, rng))
    audio = np.concatenate(pieces) if pieces else np.zeros(HOP, np.float32)
    total = int(durs.sum())
    buf = np.zeros(TRAIN_FRAMES * HOP, np.float32)
    buf[: len(audio)] = audio[: len(buf)]
    mel = np.asarray(
        log_mel(jnp.asarray(buf), n_mels=N_MELS, global_norm=False)
    ).T  # (F, n_mels)
    valid = np.zeros(TRAIN_FRAMES, np.float32)
    valid[:total] = 1.0
    return toks, durs, mel.astype(np.float32), valid


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from audio_rag_tpu.models.tts import (
        TTS_PRESETS, apply_tts, init_tts, text_to_ids,
    )
    from audio_rag_tpu.ops.mel import log_mel_spectrogram

    dims = dataclasses.replace(
        TTS_PRESETS["small"], max_text=TRAIN_TEXT, max_frames=TRAIN_FRAMES
    )
    rng = np.random.default_rng(0)
    params = init_tts(jax.random.PRNGKey(0), dims)
    steps = 3000
    opt = optax.adam(optax.cosine_decay_schedule(2e-3, steps, alpha=0.05))
    opt_state = opt.init(params)

    def make_batch(n):
        rows = [make_sample(rng, text_to_ids, log_mel_spectrogram)
                for _ in range(n)]
        return tuple(np.stack(cols) for cols in zip(*rows))

    # pre-generate a fixed pool and cycle: sample synthesis + host mel
    # extraction dominate the step otherwise (1 host CPU)
    pool = [make_batch(16) for _ in range(160)]

    @jax.jit
    def step(params, opt_state, toks, durs, mel_t, valid):
        def loss_fn(p):
            mel, _, log_dur = apply_tts(p, dims, toks, durs,
                                        dtype=jnp.float32)
            w = valid[:, :, None]
            mel_mse = jnp.sum(w * (mel - mel_t) ** 2) / (
                jnp.sum(w) * N_MELS + 1e-6)
            sym_valid = (toks != 0).astype(jnp.float32)
            dur_mse = jnp.sum(
                sym_valid * (log_dur - jnp.log(jnp.maximum(durs, 1))) ** 2
            ) / (jnp.sum(sym_valid) + 1e-6)
            return mel_mse + 0.1 * dur_mse, (mel_mse, dur_mse)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    for it in range(steps):
        toks, durs, mel_t, valid = pool[it % len(pool)]
        params, opt_state, loss, (mel_mse, dur_mse) = step(
            params, opt_state, jnp.asarray(toks), jnp.asarray(durs),
            jnp.asarray(mel_t), jnp.asarray(valid))
        if it % 200 == 0:
            print(f"step {it}: loss {float(loss):.4f} "
                  f"(mel {float(mel_mse):.4f}, dur {float(dur_mse):.4f})",
                  flush=True)

    # -- gates ---------------------------------------------------------------
    # 1) held-out duration accuracy
    toks, durs, mel_t, valid = make_batch(32)
    _, _, log_dur = apply_tts(params, dims, jnp.asarray(toks),
                              dtype=jnp.float32)
    pred = np.round(np.exp(np.asarray(log_dur)))
    sym_valid = toks != 0
    dur_ok = float(np.mean(np.abs(pred - durs)[sym_valid] <= 1))
    print(f"held-out duration within ±1 frame: {dur_ok:.3f}")

    # 2) per-vowel spectral identity on lone-character synthesis
    from audio_rag_tpu.ops.mel import mel_filterbank

    fb = mel_filterbank(N_MELS)
    centers = np.linspace(0, SR / 2, fb.shape[1])
    mel_center = (fb * centers[None, :]).sum(1) / (fb.sum(1) + 1e-9)
    vowel_hits = 0
    for c in VOWELS:
        toks_c = text_to_ids(c, TRAIN_TEXT)[None]
        mel, fvalid, _ = apply_tts(params, dims, jnp.asarray(toks_c),
                                   dtype=jnp.float32)
        n = int(np.asarray(fvalid).sum())
        m = np.asarray(mel)[0, :n].mean(0)
        top_bin = int(np.argmax(m))
        target_bin = int(np.argmin(np.abs(mel_center - char_band(c))))
        print(f"vowel {c!r}: top mel bin {top_bin} target {target_bin}")
        vowel_hits += abs(top_bin - target_bin) <= 2
    assert dur_ok >= 0.95, "duration predictor failed to learn; not saving"
    assert vowel_hits >= 4, "spectral identity failed to learn; not saving"

    OUT.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[name] = np.asarray(leaf).astype(np.float16)
    np.savez_compressed(OUT, **flat)
    print(f"saved {sum(v.size for v in flat.values())} params -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
