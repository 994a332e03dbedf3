"""Train the tiny NLI head on synthetic lexical entailment/negation data
and save the weights as a committed asset.

Real mnli checkpoints can't be downloaded here (zero egress); this gives
the NLI scorer genuinely-useful behavior on the hash tokenizer: a
hypothesis whose content words are a subset of the premise is entailed,
inserting a negation flips it to contradiction, disjoint content words are
neutral. That's exactly the ordering (entailed > neutral > contradicted)
the reranker-sigmoid proxy cannot produce — a contradiction has maximal
lexical overlap and scores HIGH relevance. Real NLI weights drop in via
``convert_reranker`` (any XLMRobertaForSequenceClassification).

Deterministic (fixed seeds, CPU). Run: python scripts/train_nli.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "audio_rag_tpu" / "assets" / "nli_small.npz"

VOCAB_WORDS = [f"word{i}" for i in range(400)] + [
    "gradient", "descent", "learning", "rate", "model", "training",
    "kernel", "variance", "bias", "overfitting", "regularization",
    "is", "the", "a", "very", "large", "small", "fast", "slow",
]


def make_pair(rng: np.random.Generator) -> tuple[str, str, int]:
    words = rng.choice(VOCAB_WORDS, size=rng.integers(6, 11),
                       replace=False).tolist()
    premise = " ".join(words)
    label = int(rng.integers(0, 3))
    k = int(rng.integers(3, min(6, len(words))))
    subset = [words[i] for i in sorted(
        rng.choice(len(words), size=k, replace=False))]
    if label == 2:  # entailment: content subset
        hypothesis = " ".join(subset)
    elif label == 0:  # contradiction: subset + negation
        pos = int(rng.integers(0, len(subset)))
        hypothesis = " ".join(subset[:pos] + ["not"] + subset[pos:])
    else:  # neutral: disjoint words
        others = [w for w in VOCAB_WORDS if w not in words]
        hypothesis = " ".join(
            rng.choice(others, size=k, replace=False).tolist())
    return premise, hypothesis, label


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from audio_rag_tpu.models.bert import BERT_PRESETS
    from audio_rag_tpu.models.cross_encoder import (
        init_cross_encoder,
        nli_forward,
    )
    from audio_rag_tpu.text.tokenizer import HashWordTokenizer, pad_batch

    dims = BERT_PRESETS["nli-small"]
    tok = HashWordTokenizer(dims.vocab)
    rng = np.random.default_rng(0)
    T = 32

    def make_batch(n):
        ids, labels = [], []
        for _ in range(n):
            p, h, y = make_pair(rng)
            ids.append(tok.encode_pair(p, h, T))
            labels.append(y)
        arr, _ = pad_batch(ids, T, -1)
        return arr, np.asarray(labels, np.int32)

    params = init_cross_encoder(jax.random.PRNGKey(0), dims, n_out=3)
    # identity-init Q/K: same-token pairs then score q·k ≈ |emb|² >> cross
    # terms from step 0, so cross-segment token matching — the signal
    # entailment-vs-neutral hinges on — exists before training instead of
    # having to be discovered (diagnosed: with random Q/K the model learns
    # negation and disjointness perfectly but NEVER overlap: entailed was
    # classified neutral 88/88)
    eye = jnp.eye(dims.d_model)
    for name in ("q", "k"):
        w = params["bert"]["blocks"]["attn"][name]["w"]
        params["bert"]["blocks"]["attn"][name]["w"] = (
            jnp.broadcast_to(eye, w.shape) * 1.0
        ).astype(w.dtype)
    opt = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, 300, 4000, 1e-5))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids, labels):
        def loss_fn(p):
            mask = (ids >= 0).astype(jnp.int32)
            toks = jnp.where(mask.astype(bool), ids, dims.pad_id)
            logits = nli_forward(p, dims, toks, mask, dtype=jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(4000):
        ids, labels = make_batch(64)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ids), jnp.asarray(labels))
        if it % 600 == 0:
            print(f"step {it}: ce {float(loss):.4f}")

    ids, labels = make_batch(256)
    mask = (ids >= 0).astype(np.int32)
    toks = np.where(mask.astype(bool), ids, dims.pad_id)
    logits = np.asarray(nli_forward(
        params, dims, jnp.asarray(toks), jnp.asarray(mask),
        dtype=jnp.float32))
    pred = logits.argmax(-1)
    acc = float((pred == labels).mean())
    print(f"held-out accuracy: {acc:.3f}")
    conf = np.zeros((3, 3), np.int64)
    for t, p in zip(labels, pred):
        conf[t, p] += 1
    print("confusion (rows=true c/n/e):")
    print(conf)

    # the asset's JOB is the entailment ORDERING (P(entail) must separate
    # entailed from contradicted/neutral hypotheses), so gate on the
    # class-conditional P(entail) margins, not raw argmax accuracy
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p_ent = (e / e.sum(-1, keepdims=True))[:, 2]
    m_ent = float(p_ent[labels == 2].mean())
    m_con = float(p_ent[labels == 0].mean())
    m_neu = float(p_ent[labels == 1].mean())
    print(f"mean P(entail): entailed={m_ent:.3f} neutral={m_neu:.3f} "
          f"contradicted={m_con:.3f}")

    OUT.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[name] = np.asarray(leaf)
    np.savez(OUT, **flat)
    print(f"saved {sum(v.size for v in flat.values())} params -> {OUT}")
    ok = acc > 0.6 and (m_ent - m_con) > 0.25 and (m_ent - m_neu) > 0.15
    if not ok:
        print("WARNING: ordering margins below gate; asset saved for "
              "inspection but should not ship")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
