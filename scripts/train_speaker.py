"""Train the small speaker-embedding encoder on synthetic voices and
save the weights as a committed asset.

The reference's diarization rides titanet_large, a VoxCeleb-trained
speaker encoder NeMo downloads at runtime (reference
``diarization/nemo.py:45-100``) — unavailable in this zero-egress
environment. Instead the same *class* of model (TDNN conv encoder with
attentive statistics pooling, :func:`audio_rag_tpu.models.speaker
.speaker_embed`) trains here by speaker-classification over hundreds of
parametric voices (:mod:`audio_rag_tpu.audio.synth`): cosine-softmax
cross-entropy over L2-normalized embeddings, the objective family real
speaker encoders use (AAM-softmax without the margin — sufficient at
this scale). Validation is open-set, the property diarization needs:
on 32 *held-out* voices, same-speaker cosine must dominate
different-speaker cosine (reported as EER).

The committed weights make both diarizers cluster MEANINGFUL embeddings
out of the box; real ECAPA/titanet weights can replace them via
``convert_speaker`` + ``diarization.checkpoint_path``.

Deterministic (fixed seeds, CPU). Run: python scripts/train_speaker.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "audio_rag_tpu" / "assets" / "speaker_small.npz"

SR = 16_000
WIN_S = 1.5           # diarization window (DiarizationConfig.window_s)
WIN = int(SR * WIN_S)
N_TRAIN_SPK = 192
WINDOWS_PER_SPK = 10
N_VAL_SPK = 32
BATCH = 64
STEPS = 500


def build_bank(rng: np.random.Generator, n_spk: int, per: int,
               mel_fn) -> tuple[np.ndarray, np.ndarray]:
    """(n_spk*per, n_mels, T) mel windows + int labels."""
    from audio_rag_tpu.audio.synth import sample_voice, utterance

    clips = np.zeros((n_spk * per, WIN), np.float32)
    labels = np.zeros(n_spk * per, np.int32)
    i = 0
    for s in range(n_spk):
        voice = sample_voice(rng)
        for _ in range(per):
            # draw slightly longer, crop a random window → phase/AM
            # diversity within a speaker
            dur = WIN_S + rng.uniform(0.2, 1.0)
            utt = utterance(rng, voice, dur, SR,
                            level=float(rng.uniform(0.15, 0.5)))
            off = rng.integers(0, utt.size - WIN + 1)
            clip = utt[off: off + WIN].copy()
            if rng.random() < 0.5:  # mild additive noise at mixed SNR
                clip += rng.uniform(0.002, 0.02) * \
                    rng.standard_normal(WIN).astype(np.float32)
            clips[i] = clip
            labels[i] = s
            i += 1
    # mel in bucketed jitted batches
    mels = []
    for base in range(0, clips.shape[0], 128):
        block = clips[base: base + 128]
        pad = 128 - block.shape[0]
        if pad:
            block = np.concatenate([block, np.zeros((pad, WIN), np.float32)])
        mels.append(np.asarray(mel_fn(block))[: 128 - pad])
    return np.concatenate(mels), labels


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from audio_rag_tpu.models.speaker import (
        SPEAKER_PRESETS,
        init_speaker_encoder,
        speaker_embed,
    )
    from audio_rag_tpu.ops.mel import log_mel_spectrogram

    dims = SPEAKER_PRESETS["small"]
    mel_fn = jax.jit(jax.vmap(
        lambda a: log_mel_spectrogram(a, n_mels=dims.n_mels,
                                      global_norm=False)))

    rng = np.random.default_rng(0)
    t0 = time.time()
    mels, labels = build_bank(rng, N_TRAIN_SPK, WINDOWS_PER_SPK, mel_fn)
    print(f"train bank: {mels.shape} in {time.time() - t0:.1f}s")

    key = jax.random.PRNGKey(0)
    params = init_speaker_encoder(key, dims)
    # cosine-softmax classifier head (not saved with the encoder)
    head = jax.random.normal(
        jax.random.PRNGKey(1), (dims.emb_dim, N_TRAIN_SPK), jnp.float32
    ) * dims.emb_dim ** -0.5
    state = {"enc": params, "head": head}
    opt = optax.adam(2e-3)
    opt_state = opt.init(state)
    scale = 16.0

    @jax.jit
    def step(state, opt_state, mel, y):
        def loss_fn(st):
            emb = speaker_embed(st["enc"], dims, mel, dtype=jnp.float32)
            w = st["head"]
            w = w / jnp.maximum(
                jnp.linalg.norm(w, axis=0, keepdims=True), 1e-9)
            logits = scale * emb @ w
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(state, updates), opt_state, loss

    n = mels.shape[0]
    for it in range(STEPS):
        idx = rng.integers(0, n, BATCH)
        state, opt_state, loss = step(
            state, opt_state, jnp.asarray(mels[idx]),
            jnp.asarray(labels[idx]))
        if it % 50 == 0:
            print(f"step {it}: ce {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)")

    params = state["enc"]

    # -- open-set validation on held-out voices ----------------------------
    val_rng = np.random.default_rng(12345)
    vmels, vlabels = build_bank(val_rng, N_VAL_SPK, 6, mel_fn)
    emb = []
    embed_fn = jax.jit(
        lambda p, m: speaker_embed(p, dims, m, dtype=jnp.float32))
    for base in range(0, vmels.shape[0], 64):
        emb.append(np.asarray(embed_fn(params, jnp.asarray(
            vmels[base: base + 64]))))
    emb = np.concatenate(emb)
    sims = emb @ emb.T
    same = vlabels[:, None] == vlabels[None, :]
    iu = np.triu_indices(len(vlabels), k=1)
    pos = sims[iu][same[iu]]
    neg = sims[iu][~same[iu]]
    # EER: threshold sweep over all scores
    thr = np.unique(np.concatenate([pos, neg]))
    far = (neg[None, :] >= thr[:, None]).mean(axis=1)
    frr = (pos[None, :] < thr[:, None]).mean(axis=1)
    eer = float((far + frr)[np.argmin(np.abs(far - frr))] / 2)
    print(f"held-out: same-cos {pos.mean():.3f} diff-cos {neg.mean():.3f} "
          f"margin {pos.mean() - neg.mean():.3f} EER {eer:.3f}")
    assert pos.mean() - neg.mean() > 0.25, "no speaker separation; not saving"
    assert eer < 0.15, f"EER {eer:.3f} too high; not saving"

    # blocks is a list → store under string indices for the npz nesting
    tree = dict(params)
    tree["blocks"] = {str(i): blk for i, blk in enumerate(params["blocks"])}
    from audio_rag_tpu.checkpoint import save_npz_asset

    OUT.parent.mkdir(parents=True, exist_ok=True)
    save_npz_asset(OUT, jax.tree.map(np.asarray, tree))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"saved {n_params} params -> {OUT} "
          f"({OUT.stat().st_size / 1e6:.2f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
