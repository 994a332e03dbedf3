"""Train the tiny retrieval models for the discriminating quality eval.

Two committed assets (``audio_rag_tpu/assets/``):

* ``retr_embedder_small.npz`` — BGE-M3-class bi-encoder
  (``retrieval-small`` preset) trained with in-batch InfoNCE on
  (query, chunk) pairs from the synthetic corpus
  (:mod:`audio_rag_tpu.evaluation.corpus`) plus an IDF-target regression
  on the sparse lexical-weight head. The contrastive pairs use QUERY
  surface forms against LECTURE surface forms, so the model must learn the
  synonym map — the mechanism that makes dense retrieval beat lexical
  matching. Section tags are held OUT of its training queries, so tag
  queries stay dense-hard (that is sparse/hybrid's job).
* ``retr_reranker_small.npz`` — cross-encoder (same preset, 1-logit head)
  trained with binary CE on relevant/hard-negative (query, chunk) pairs,
  including the concept-PAIR queries whose one-concept-overlap negatives a
  single-vector bi-encoder half-matches — the mechanism that makes
  rerank > no-rerank.

Real BGE-M3 / bge-reranker checkpoints cannot be downloaded here (zero
egress); this mirrors how ``scripts/train_{vad,nli,tts}.py`` made those
paths meaningful. Deterministic (fixed seeds, CPU).

Run: ``python scripts/train_retrieval.py`` (~3 min). Prints the quality
sweep at the end; docs/FIDELITY.md carries the committed table.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
ASSETS = REPO / "audio_rag_tpu" / "assets"

EMB_STEPS = 1500
RR_STEPS = 4000
BATCH = 64
TQ, TD = 16, 32  # query / doc token buckets (pair bucket = 48)


def _sparse_targets(corpus, tok, vocab: int) -> np.ndarray:
    """Per-token-id target lexical weight for the sparse head: IDF-like —
    unique section tags ≈ 1, concept words ≈ 0.7, stop/template words ≈ 0.
    (BGE-M3 learns this signal from contrastive data; a direct regression
    is the honest tiny-scale shortcut.)"""
    df = np.zeros(vocab, np.float32)
    for text in corpus.chunks:
        for tid in set(tok.encode(text, add_special=False)):
            df[tid] += 1.0
    n_docs = len(corpus.chunks)
    t = np.zeros(vocab, np.float32)
    seen = df > 0
    t[seen] = np.log(n_docs / df[seen]) / np.log(n_docs)  # idf in [0, 1]
    # query-side forms never occur in chunks; give them concept-level
    # informativeness so query sparse vectors weight them (harmless: no
    # doc contains them, so they can never match — but the head must not
    # learn "unseen ⇒ 0" and kill tag weights in QUERIES either)
    for forms in corpus.query_forms:
        for w in forms:
            t[tok._word_id(w)] = 0.7
    return t


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from audio_rag_tpu.checkpoint import save_npz_asset
    from audio_rag_tpu.evaluation.corpus import (
        _QUERY_TEMPLATES_A,
        _QUERY_TEMPLATES_B,
        _QUERY_TEMPLATES_C,
        CHUNKS_PER_TOPIC,
        CONCEPTS_PER_TOPIC,
        N_TOPICS,
        make_corpus,
    )
    from audio_rag_tpu.models.bert import BERT_PRESETS
    from audio_rag_tpu.models.bgem3 import bgem3_forward, init_bgem3
    from audio_rag_tpu.models.cross_encoder import (
        cross_encoder_forward,
        init_cross_encoder,
    )
    from audio_rag_tpu.text.tokenizer import HashWordTokenizer, pad_batch

    dims = BERT_PRESETS["retrieval-small"]
    corpus = make_corpus()
    tok = HashWordTokenizer(dims.vocab)
    rng = np.random.default_rng(7)
    targets = _sparse_targets(corpus, tok, dims.vocab)
    targets_j = jnp.asarray(targets)

    # pre-encode every chunk once (tokenizing 240 chunks per batch was the
    # dominant host cost of a training step)
    chunk_ids = [tok.encode(t) for t in corpus.chunks]
    chunk_ns = [tok.encode(t, add_special=False) for t in corpus.chunks]

    def pair_ids(q: str, ci: int, max_len: int) -> list[int]:
        """encode_pair with the cached chunk-side ids (same layout as
        HashWordTokenizer.encode_pair)."""
        ia = tok.encode(q, add_special=False)
        ib = chunk_ns[ci]
        budget = max_len - len(ia) - 4
        out = [tok.cls_id, *ia, tok.sep_id, tok.sep_id,
               *ib[: max(budget, 0)], tok.sep_id]
        return out[:max_len]

    def make_query(t: int, kind: str) -> tuple[str, list[int]]:
        """(query text, ground-truth relevant chunk indices)."""
        qf = corpus.query_forms[t]
        if kind == "A":
            c = int(rng.integers(CONCEPTS_PER_TOPIC))
            tpl = _QUERY_TEMPLATES_A[int(rng.integers(
                len(_QUERY_TEMPLATES_A)))]
            return tpl.format(q0=qf[c]), corpus.relevant_chunks(t, (c,))
        if kind == "C":
            a, b = sorted(rng.choice(CONCEPTS_PER_TOPIC, 2, replace=False))
            tpl = _QUERY_TEMPLATES_C[int(rng.integers(
                len(_QUERY_TEMPLATES_C)))]
            return (tpl.format(q0=qf[int(a)], q1=qf[int(b)]),
                    corpus.relevant_chunks(t, (int(a), int(b))))
        i = t * CHUNKS_PER_TOPIC + int(rng.integers(CHUNKS_PER_TOPIC))
        tpl = _QUERY_TEMPLATES_B[int(rng.integers(len(_QUERY_TEMPLATES_B)))]
        return tpl.format(tag=corpus.tags[i]), [i]

    # ---- embedder ---------------------------------------------------------
    def emb_batch():
        """(q_ids, d_ids): aligned positives; in-batch rows are negatives.
        Topics are sampled WITHOUT replacement per batch so in-batch
        negatives are cross-topic (a same-topic 'negative' could be a true
        positive and would poison the loss). Tag queries excluded — dense
        must stay blind to tags."""
        topics = rng.choice(N_TOPICS, size=min(BATCH, N_TOPICS),
                            replace=False)
        qs, ds = [], []
        for t in topics:
            kind = "A" if rng.random() < 0.5 else "C"
            q, rel = make_query(int(t), kind)
            if not rel:
                continue
            qs.append(tok.encode(q)[:TQ])
            ds.append(chunk_ids[int(rng.choice(rel))][:TD])
        q_ids, _ = pad_batch(qs, TQ, -1)
        d_ids, _ = pad_batch(ds, TD, -1)
        return q_ids, d_ids

    emb_params = init_bgem3(jax.random.PRNGKey(0), dims)
    opt = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 2e-3, 200, EMB_STEPS, 1e-5))
    opt_state = opt.init(emb_params)

    def _fwd(p, ids_packed):
        mask = (ids_packed >= 0).astype(jnp.int32)
        ids = jnp.where(mask.astype(bool), ids_packed, dims.pad_id)
        dense, w = bgem3_forward(p, dims, ids, mask, dtype=jnp.float32)
        return dense, w, mask, ids

    @jax.jit
    def emb_step(params, opt_state, q_ids, d_ids):
        def loss_fn(p):
            qd, qw, qm, qi = _fwd(p, q_ids)
            dd, dw, dm, di = _fwd(p, d_ids)
            logits = (qd @ dd.T) / 0.05
            n = logits.shape[0]
            nce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.arange(n)).mean()
            # sparse head: regress token weights onto IDF-ish targets
            def sp(w, m, ids):
                t = targets_j[ids] * m
                return jnp.sum((w - t) ** 2 * m) / jnp.maximum(
                    jnp.sum(m), 1.0)
            sparse = sp(qw, qm.astype(jnp.float32), qi) + \
                sp(dw, dm.astype(jnp.float32), di)
            return nce + 0.5 * sparse, (nce, sparse)

        (loss, (nce, sp_l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, nce, sp_l

    t0 = time.time()
    for it in range(EMB_STEPS):
        q_ids, d_ids = emb_batch()
        emb_params, opt_state, nce, sp_l = emb_step(
            emb_params, opt_state, jnp.asarray(q_ids), jnp.asarray(d_ids))
        if it % 250 == 0:
            print(f"emb step {it}: nce {float(nce):.4f} "
                  f"sparse {float(sp_l):.4f} ({time.time()-t0:.0f}s)")

    save_npz_asset(ASSETS / "retr_embedder_small.npz", emb_params)
    print(f"saved {ASSETS/'retr_embedder_small.npz'}")

    # ---- reranker ---------------------------------------------------------
    def rr_batch():
        """(pair_ids, labels): positives + hard negatives. Hard negatives
        are same-topic chunks that MISS a queried concept — exactly the
        rows a bag-of-words bi-encoder half-matches."""
        ids, ys = [], []
        for _ in range(BATCH):
            t = int(rng.integers(N_TOPICS))
            kind = ("A", "B", "C")[int(rng.integers(3))]
            q, rel = make_query(t, kind)
            if not rel:
                continue
            if rng.random() < 0.5:
                i, y = int(rng.choice(rel)), 1.0
            else:
                if rng.random() < 0.7:  # hard: same topic, not relevant
                    cand = [j for j in range(t * CHUNKS_PER_TOPIC,
                                             (t + 1) * CHUNKS_PER_TOPIC)
                            if j not in rel]
                else:  # easy: other topic
                    cand = [int(rng.integers(len(corpus.chunks)))]
                    cand = [j for j in cand if j not in rel]
                if not cand:
                    continue
                i, y = int(rng.choice(cand)), 0.0
            ids.append(pair_ids(q, i, TQ + TD))
            ys.append(y)
        arr, _ = pad_batch(ids, TQ + TD, -1)
        return arr, np.asarray(ys, np.float32)

    rr_params = init_cross_encoder(jax.random.PRNGKey(1), dims, n_out=1)
    # identity-init Q/K (same trick as scripts/train_nli.py): cross-segment
    # token matching exists from step 0 instead of having to be discovered
    eye = jnp.eye(dims.d_model)
    for name in ("q", "k"):
        w = rr_params["bert"]["blocks"]["attn"][name]["w"]
        rr_params["bert"]["blocks"]["attn"][name]["w"] = (
            jnp.broadcast_to(eye, w.shape) * 1.0).astype(w.dtype)
    # synonym-tied token embeddings: each concept's QUERY form starts at
    # its LECTURE form's (random) vector, so identity-Q/K cross-attention
    # sees a synonym pair exactly like a same-token pair — the regime the
    # NLI training proved learnable. This stands in for the distributional
    # synonymy a pretrained checkpoint provides (a real bge-reranker is
    # fine-tuned FROM XLM-R, never from scratch); the training still has
    # to learn the pair logic and the scoring head. (Warm-starting from
    # the trained embedder's table was tried and does NOT work: its
    # contrastively-shaped correlations make identity-Q/K attention
    # patterns noisy and the loss plateaus at the 0.693 base rate.)
    tab = np.asarray(rr_params["bert"]["tok_emb"]["table"]).copy()
    for t in range(N_TOPICS):
        for k in range(CONCEPTS_PER_TOPIC):
            qi = tok._word_id(corpus.query_forms[t][k])
            di = tok._word_id(corpus.doc_forms[t][k])
            tab[qi] = tab[di]
    rr_params["bert"]["tok_emb"]["table"] = jnp.asarray(tab)
    opt2 = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, 200, RR_STEPS, 1e-5))
    opt2_state = opt2.init(rr_params)

    @jax.jit
    def rr_step(params, opt_state, ids_packed, labels):
        def loss_fn(p):
            mask = (ids_packed >= 0).astype(jnp.int32)
            ids = jnp.where(mask.astype(bool), ids_packed, dims.pad_id)
            logits = cross_encoder_forward(p, dims, ids, mask,
                                           dtype=jnp.float32)
            return optax.sigmoid_binary_cross_entropy(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt2.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for it in range(RR_STEPS):
        ids, ys = rr_batch()
        rr_params, opt2_state, loss = rr_step(
            rr_params, opt2_state, jnp.asarray(ids), jnp.asarray(ys))
        if it % 250 == 0:
            print(f"rr step {it}: bce {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)")

    save_npz_asset(ASSETS / "retr_reranker_small.npz", rr_params)
    print(f"saved {ASSETS/'retr_reranker_small.npz'}")

    # ---- report the sweep -------------------------------------------------
    from audio_rag_tpu.evaluation.quality import run_quality_sweep

    sweep = run_quality_sweep()
    for cfg, m in sweep.items():
        print(f"{cfg:>16}: P@5 {m['p_at_5']:.3f}  MRR {m['mrr']:.3f}  "
              f"NDCG {m['ndcg']:.3f}  hit {m['hit_rate']:.3f}  "
              f"by_type={m['by_type']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
