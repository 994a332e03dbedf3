"""Train the tiny generator LLM on synthetic RAG tasks and save the
weights as a committed asset (``assets/llm_small.npz``).

The reference's generator is a downloaded ollama llama3.2
(``generation/ollama.py:58-96``); zero egress leaves this repo's LLM
family random-init — answers never EOS (every bench decodes a fixed 128
tokens), HyDE hypotheses are noise, and the LLM-judged metrics parse
noise. This trains the ``eval-small`` preset on four task families over
the synthetic discriminating corpus (:mod:`audio_rag_tpu.evaluation.corpus`),
all through the PRODUCT prompt formats:

* **RAG answers** (``generation/prompts.py build_rag_prompt``): grounded
  answer naming the queried concepts' lecture-side forms + the relevant
  excerpt's section tag, then EOS — natural termination + echo behavior;
* **HyDE passages** (``expansion/hyde.py HYDE_PROMPT``): a pseudo-chunk
  passage for the queried concepts — what makes HyDE retrieval work;
* **faithfulness ratings** ("Rate 0-10 ... Rating:"): high when the
  answer's content words appear in the contexts, low when disjoint;
* **yes/no verdicts** ("Is the CONTEXT useful ... Verdict:"): yes iff
  the context covers the question's concept (the learned query↔doc
  synonym map, same signal the trained retrieval models learn).

Gates before saving: EOS rate ≥ 0.9 at max_tokens=64; grounded-concept
rate ≥ 0.7 on held-out questions; judge direction (mean rating on
faithful > unfaithful; verdict accuracy ≥ 0.8).

Deterministic (fixed seeds). Run: python scripts/train_llm.py [--cpu]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
OUT = REPO / "audio_rag_tpu" / "assets" / "llm_small.npz"

N_DATA = 6144
BATCH = 64
STEPS = 8000
CHUNK = 250
S = 320  # token context per sample (prompt tail + answer + eos)
LR = 3e-4
VOCAB_OUT = REPO / "audio_rag_tpu" / "assets" / "llm_small_vocab.json"


def log(msg: str) -> None:
    print(msg, flush=True)


# -- sample synthesis -------------------------------------------------------

def _fake_results(c, idxs, rng):
    from audio_rag_tpu.core.types import RetrievalResult

    out = []
    for i in idxs:
        t0 = float(rng.integers(0, 3000))
        out.append(RetrievalResult(
            text=c.chunks[i], score=float(rng.uniform(0.3, 0.95)),
            start=t0, end=t0 + 30.0,
            speaker=f"SPEAKER_{int(rng.integers(2)):02d}",
        ))
    return out


def make_rag_sample(c, rng):
    """(prompt_text, answer_text): product build_rag_prompt + grounded
    answer citing the relevant excerpt."""
    from audio_rag_tpu.evaluation.corpus import (
        CHUNKS_PER_TOPIC,
        N_TOPICS,
        _PAIRS,
        _QUERY_TEMPLATES_A,
        _QUERY_TEMPLATES_C,
    )
    from audio_rag_tpu.generation.prompts import (
        SYSTEM_PROMPT,
        build_rag_prompt,
    )

    t = int(rng.integers(N_TOPICS))
    pair = rng.random() < 0.5
    if pair:
        a, b = _PAIRS[int(rng.integers(len(_PAIRS)))]
        q = _QUERY_TEMPLATES_C[int(rng.integers(len(_QUERY_TEMPLATES_C)))]
        q = q.format(q0=c.query_forms[t][a], q1=c.query_forms[t][b])
        rel = c.relevant_chunks(t, (a, b))
    else:
        a = int(rng.integers(4))
        b = None
        q = _QUERY_TEMPLATES_A[int(rng.integers(len(_QUERY_TEMPLATES_A)))]
        q = q.format(q0=c.query_forms[t][a])
        rel = c.relevant_chunks(t, (a,))
    rel_i = int(rng.choice(rel))
    # distractors from other topics
    n_ex = int(rng.integers(3, 6))
    others = rng.choice(
        [i for i in range(len(c.chunks))
         if i // CHUNKS_PER_TOPIC != t], size=n_ex - 1, replace=False)
    idxs = [rel_i] + [int(i) for i in others]
    order = rng.permutation(n_ex)
    idxs = [idxs[i] for i in order]
    cite = int(np.nonzero(order == 0)[0][0]) + 1  # 1-based excerpt no.
    results = _fake_results(c, idxs, rng)
    prompt = f"{SYSTEM_PROMPT}\n\n{build_rag_prompt(q, results)}"
    da = c.doc_forms[t][a]
    if rng.random() < 0.45:
        # EXTRACTIVE mode, selected by an instruction line: quote the
        # relevant excerpt verbatim + cite. Copying a prompt span is the
        # regime the n-gram (prompt-lookup) drafter accepts — this
        # teaches the behavior that realizes speculative decode on the
        # product answer path.
        prompt = prompt.replace(
            "\nAnswer:",
            "\nQuote the most relevant excerpt in your answer.\nAnswer:")
        ans = f"{c.chunks[rel_i]} [Excerpt {cite}]"
    elif b is not None:
        db = c.doc_forms[t][b]
        ans = (f"the lecture covers {da} alongside {db} in section "
               f"{c.tags[rel_i]} [Excerpt {cite}]")
    else:
        ans = (f"the lecture discusses {da} in section {c.tags[rel_i]} "
               f"[Excerpt {cite}]")
    return prompt, ans


def make_hyde_sample(c, rng):
    from audio_rag_tpu.evaluation.corpus import (
        N_TOPICS,
        _PAIRS,
        _QUERY_TEMPLATES_C,
    )
    from audio_rag_tpu.expansion.hyde import HYDE_PROMPT

    t = int(rng.integers(N_TOPICS))
    a, b = _PAIRS[int(rng.integers(len(_PAIRS)))]
    q = _QUERY_TEMPLATES_C[int(rng.integers(len(_QUERY_TEMPLATES_C)))]
    q = q.format(q0=c.query_forms[t][a], q1=c.query_forms[t][b])
    rel = c.relevant_chunks(t, (a, b))
    passage = c.chunks[int(rng.choice(rel))]
    return HYDE_PROMPT.format(query=q), passage


def make_rating_sample(c, rng):
    """Faithfulness judge: rate high iff answer words appear in contexts
    (mirrors RAGEvaluator.judge_faithfulness's prompt)."""
    i = int(rng.integers(len(c.chunks)))
    ctxs = [c.chunks[i]] + [
        c.chunks[int(j)] for j in rng.integers(0, len(c.chunks), size=2)]
    t = c.topic_of[i]
    a, b = c.pair_of[i]
    faithful = rng.random() < 0.5
    if faithful:
        ans = (f"the lecture covers {c.doc_forms[t][a]} alongside "
               f"{c.doc_forms[t][b]} in section {c.tags[i]}")
        rating = int(rng.integers(8, 11))
    else:
        t2 = (t + 1 + int(rng.integers(len(c.doc_forms) - 1))) \
            % len(c.doc_forms)
        ans = (f"the lecture covers {c.doc_forms[t2][0]} alongside "
               f"{c.doc_forms[t2][1]} in section unknown")
        rating = int(rng.integers(0, 3))
    ctx = "\n---\n".join(x[:500] for x in ctxs)
    q = f"what is covered in section {c.tags[i]}"
    prompt = (
        "Rate 0-10 how well the ANSWER is supported by the CONTEXTS. "
        "Reply with a single number.\n\n"
        f"QUESTION: {q}\nANSWER: {ans}\nCONTEXTS:\n{ctx}\n\nRating:"
    )
    return prompt, str(rating)


def make_verdict_sample(c, rng):
    """Context-precision judge: yes iff the context covers the question's
    concept (mirrors RAGEvaluator.judge_context_precision's prompt)."""
    from audio_rag_tpu.evaluation.corpus import _QUERY_TEMPLATES_A

    i = int(rng.integers(len(c.chunks)))
    t = c.topic_of[i]
    useful = rng.random() < 0.5
    if useful:
        concept = int(rng.choice(list(c.pair_of[i])))
        tq = t
    else:
        tq = (t + 1 + int(rng.integers(len(c.doc_forms) - 1))) \
            % len(c.doc_forms)
        concept = int(rng.integers(4))
    q = _QUERY_TEMPLATES_A[int(rng.integers(len(_QUERY_TEMPLATES_A)))]
    q = q.format(q0=c.query_forms[tq][concept])
    prompt = (
        "Is the CONTEXT useful for answering the QUESTION? "
        "Reply yes or no.\n\n"
        f"QUESTION: {q}\n"
        f"CONTEXT: {c.chunks[i][:500]}\n\nVerdict:"
    )
    return prompt, "yes" if useful else "no"


def make_revq_sample(c, rng):
    """Answer-relevancy support: regenerate the question an answer
    addresses (mirrors RAGEvaluator.judge_answer_relevancy's prompt —
    the doc→query inverse of the synonym map)."""
    from audio_rag_tpu.evaluation.corpus import _QUERY_TEMPLATES_A

    t = int(rng.integers(len(c.doc_forms)))
    concept = int(rng.integers(4))
    i = int(rng.choice(c.relevant_chunks(t, (concept,))))
    ans = (f"the lecture discusses {c.doc_forms[t][concept]} in section "
           f"{c.tags[i]}")
    q = _QUERY_TEMPLATES_A[int(rng.integers(len(_QUERY_TEMPLATES_A)))]
    q = q.format(q0=c.query_forms[t][concept])
    prompt = (
        "Write one short question that the following ANSWER directly "
        "answers. Reply with only the question.\n\n"
        f"ANSWER: {ans}\n\nQUESTION:"
    )
    return prompt, q


def make_attr_sample(c, rng):
    """Context-recall support: statement attribution (mirrors
    RAGEvaluator.judge_context_recall's prompt)."""
    i = int(rng.integers(len(c.chunks)))
    t = c.topic_of[i]
    ctxs = [c.chunks[i]] + [
        c.chunks[int(j)] for j in rng.integers(0, len(c.chunks), size=2)]
    rng.shuffle(ctxs)
    supported = rng.random() < 0.5
    if supported:
        concept = int(rng.choice(list(c.pair_of[i])))
        s = (f"the lecture discusses {c.doc_forms[t][concept]} in "
             f"section {c.tags[i]}.")
    else:
        t2 = (t + 1 + int(rng.integers(len(c.doc_forms) - 1))) \
            % len(c.doc_forms)
        s = (f"the lecture discusses {c.doc_forms[t2][0]} in section "
             "unknown.")
    ctx = "\n---\n".join(x[:500] for x in ctxs)
    prompt = (
        "Can the STATEMENT be attributed to (supported by) the "
        "CONTEXTS? Reply yes or no.\n\n"
        f"CONTEXTS:\n{ctx}\n\nSTATEMENT: {s}\n\nVerdict:"
    )
    return prompt, "yes" if supported else "no"


def make_samples(c, rng, n):
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.46:
            out.append(make_rag_sample(c, rng))
        elif r < 0.56:
            out.append(make_hyde_sample(c, rng))
        elif r < 0.68:
            out.append(make_rating_sample(c, rng))
        elif r < 0.84:
            out.append(make_verdict_sample(c, rng))
        elif r < 0.92:
            out.append(make_revq_sample(c, rng))
        else:
            out.append(make_attr_sample(c, rng))
    return out


def encode_samples(samples, tok, eos):
    """(tokens, targets, mask) (N, S): product encoding — full prompt
    (cls..sep) tail-truncated like generate_batch, answer ids, EOS."""
    N = len(samples)
    tokens = np.full((N, S), eos, np.int32)
    targets = np.full((N, S), eos, np.int32)
    mask = np.zeros((N, S), np.float32)
    for i, (prompt, answer) in enumerate(samples):
        p = tok.encode(prompt)  # [cls, ..., sep] — sep doubles as eos
        a = tok.encode(answer, add_special=False) + [eos]
        p = p[-(S - len(a)):]  # keep the tail (Question/Answer lines)
        seq = p + a
        inp, tgt = seq[:-1], seq[1:]
        tokens[i, : len(inp)] = inp
        targets[i, : len(tgt)] = tgt
        mask[i, len(p) - 1: len(tgt)] = 1.0  # loss on answer + EOS only
    return tokens, targets, mask


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=STEPS)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from audio_rag_tpu.utils.jax_cache import (
        apply_platform_env,
        enable_compilation_cache,
    )

    apply_platform_env()
    import jax

    if not args.cpu:
        enable_compilation_cache()
    import jax.numpy as jnp
    import optax

    from audio_rag_tpu.evaluation.corpus import make_corpus
    from audio_rag_tpu.models.llm import LLM_PRESETS, init_llm, llm_forward
    from audio_rag_tpu.text.tokenizer import HashWordTokenizer

    dims = LLM_PRESETS["eval-small"]
    tok = HashWordTokenizer(dims.vocab)
    eos = tok.eos_id
    c = make_corpus()
    rng = np.random.default_rng(0)

    t0 = time.time()
    samples = make_samples(c, rng, N_DATA)
    tokens, targets, mask = encode_samples(samples, tok, eos)
    log(f"dataset: {N_DATA} samples in {time.time() - t0:.1f}s "
        f"(mean prompt+answer {mask.sum(1).mean():.0f} loss tokens)")

    n_batches = N_DATA // BATCH
    tok_b = jnp.asarray(tokens).reshape(n_batches, BATCH, S)
    tgt_b = jnp.asarray(targets).reshape(n_batches, BATCH, S)
    msk_b = jnp.asarray(mask).reshape(n_batches, BATCH, S)

    params = init_llm(jax.random.PRNGKey(0), dims)
    chunk = min(CHUNK, args.steps)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, LR, min(200, max(args.steps // 10, 1)), args.steps,
        end_value=LR * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    def loss_fn(p, tokens, targets, msk):
        logits, _ = llm_forward(p, dims, tokens, 0, None, jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * msk) / jnp.maximum(jnp.sum(msk), 1.0)

    @jax.jit
    def run_chunk(params, opt_state, start, tok_b, tgt_b, msk_b):
        def one_step(carry, i):
            params, opt_state = carry
            b = i % n_batches
            tt = jax.lax.dynamic_index_in_dim(tok_b, b, keepdims=False)
            tg = jax.lax.dynamic_index_in_dim(tgt_b, b, keepdims=False)
            mm = jax.lax.dynamic_index_in_dim(msk_b, b, keepdims=False)
            loss, grads = jax.value_and_grad(loss_fn)(params, tt, tg, mm)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), start + jnp.arange(chunk))
        return params, opt_state, losses

    t0 = time.time()
    for start in range(0, args.steps, chunk):
        params, opt_state, losses = run_chunk(
            params, opt_state, jnp.int32(start), tok_b, tgt_b, msk_b)
        ls = np.asarray(losses)
        log(f"steps {start}-{start + chunk}: loss {ls[0]:.4f} -> "
            f"{ls[-1]:.4f} ({time.time() - t0:.0f}s)")
    params = jax.device_get(params)

    # -- gates through the real product generator path ----------------------
    from audio_rag_tpu.checkpoint import save_npz_asset

    OUT.parent.mkdir(parents=True, exist_ok=True)
    save_npz_asset(OUT, jax.tree.map(
        lambda x: np.asarray(x, np.float16), params))
    # vocab sidecar: HashWordTokenizer decodes only ids its process has
    # encoded (text/tokenizer.py reverse map); a fresh serving process
    # would render the trained model's emissions as <unk>. The training
    # tokenizer's reverse map IS the model's emittable vocabulary —
    # ship it with the weights.
    import json as _json

    VOCAB_OUT.write_text(_json.dumps(
        {str(k): v for k, v in tok._reverse.items()}))
    log(f"saved asset -> {OUT} ({OUT.stat().st_size / 1e6:.1f} MB) "
        f"+ vocab sidecar ({len(tok._reverse)} words); gating...")

    from audio_rag_tpu.config.schema import GenerationConfig
    from audio_rag_tpu.generation.llm_jax import LLMGenerator

    gen = LLMGenerator(GenerationConfig(
        model="eval-small", backend="llm-jax", temperature=0.0,
        use_scheduler=False, max_tokens=64))
    gen.load()

    held = np.random.default_rng(5555)
    n_eval = 24
    eos_ok = 0
    grounded = 0
    for _ in range(n_eval):
        prompt, gold = make_rag_sample(c, held)
        # product call path: system is already baked into the sample
        out = gen.generate(prompt, max_tokens=64)
        n_out = gen.last_token_counts[0]
        if n_out < 64:
            eos_ok += 1
        gold_concepts = [w for w in gold.split()
                        if w in {w2 for f in c.doc_forms for w2 in f}]
        if gold_concepts and all(w in out for w in gold_concepts):
            grounded += 1
    eos_rate = eos_ok / n_eval
    grounded_rate = grounded / n_eval
    log(f"EOS rate {eos_rate:.2f}, grounded-concept rate "
        f"{grounded_rate:.2f}")
    prompt, gold = make_rag_sample(c, held)
    log(f"  sample answer: {gen.generate(prompt, max_tokens=64)!r}")
    log(f"  gold:          {gold!r}")

    # judge direction
    ratings_f, ratings_u = [], []
    verdict_ok = 0
    n_j = 32
    for _ in range(n_j):
        p, r = make_rating_sample(c, held)
        out = gen.generate(p, max_tokens=4)
        import re as _re

        m = _re.search(r"\d+", out)
        v = float(m.group()) if m else 5.0
        (ratings_f if int(r) >= 8 else ratings_u).append(v)
        p, r = make_verdict_sample(c, held)
        out = gen.generate(p, max_tokens=3).lower()
        verdict_ok += int(("yes" in out) == (r == "yes"))
    mean_f = float(np.mean(ratings_f)) if ratings_f else 0.0
    mean_u = float(np.mean(ratings_u)) if ratings_u else 10.0
    verdict_acc = verdict_ok / n_j
    log(f"judge: faithful mean {mean_f:.1f} vs unfaithful {mean_u:.1f}; "
        f"verdict acc {verdict_acc:.2f}")

    # the two round-5b judge templates (context recall / answer relevancy)
    attr_ok = 0
    for _ in range(16):
        p, r = make_attr_sample(c, held)
        out = gen.generate(p, max_tokens=3).lower()
        attr_ok += int(("yes" in out) == (r == "yes"))
    attr_acc = attr_ok / 16
    qf_vocab = {w for f in c.query_forms for w in f}
    revq_hit = 0
    for _ in range(12):
        p, q_gold = make_revq_sample(c, held)
        out = gen.generate(p, max_tokens=24)
        qf = [w for w in q_gold.split() if w in qf_vocab]
        revq_hit += int(bool(qf) and all(w in out for w in qf))
    revq_rate = revq_hit / 12
    log(f"attribution acc {attr_acc:.2f}; reverse-question query-form "
        f"hit {revq_rate:.2f}")

    # extractive mode: quote-instruction prompts must realize n-gram
    # drafter acceptance (the speculative-decode regime). The corpus's
    # 10-word filler vocabulary makes 2-gram prompt-lookup ambiguous in
    # each chunk's filler tail (the latest match is often a different
    # chunk), so the unique head accepts and the tail rejects — the gate
    # is tokens-per-verify ≥ 1.8 (≈2x fewer weight reads), not a
    # near-1.0 acceptance no 2-gram drafter can reach here.
    gen.config.speculative_k = 8
    accs, tpvs = [], []
    for _ in range(12):
        while True:
            p, gold = make_rag_sample(c, held)
            if "Quote the most relevant" in p:
                break
        gen.generate(p, max_tokens=48)
        if gen.last_spec_stats:
            accs.append(gen.last_spec_stats["accept_rate"])
            tpvs.append(gen.last_spec_stats["tokens_per_verify"])
    gen.config.speculative_k = 0
    accept = float(np.mean(accs)) if accs else 0.0
    tpv = float(np.mean(tpvs)) if tpvs else 0.0
    log(f"extractive-mode draft acceptance: {accept:.2f}, "
        f"tokens/verify {tpv:.2f} ({len(accs)} prompts)")

    if (eos_rate < 0.9 or grounded_rate < 0.7
            or mean_f <= mean_u + 2.0 or verdict_acc < 0.72
            or tpv < 1.8 or attr_acc < 0.6 or revq_rate < 0.4):
        OUT.unlink(missing_ok=True)
        VOCAB_OUT.unlink(missing_ok=True)
        log("GATE FAILED; asset removed")
        return 1
    log("gates passed; asset committed-ready")
    return 0


if __name__ == "__main__":
    sys.exit(main())
