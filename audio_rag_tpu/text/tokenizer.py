"""Tokenizers for the embedding/reranking/LLM paths.

The reference relies on HF tokenizers bundled with each model. In this
zero-egress build, real vocab files load via :class:`HFTokenizer` when a
local checkpoint directory provides them; otherwise the deterministic
:class:`HashWordTokenizer` is used — it maps equal words to equal ids
(stable across processes), so sparse/lexical retrieval and hybrid fusion
behave meaningfully even without downloaded vocabularies.
"""

from __future__ import annotations

import hashlib
import re
from typing import Protocol, Sequence

__all__ = ["Tokenizer", "HashWordTokenizer", "HFTokenizer", "get_tokenizer"]

_WORD_RE = re.compile(r"[a-z0-9]+(?:'[a-z]+)?")


class Tokenizer(Protocol):
    vocab_size: int
    cls_id: int
    sep_id: int
    pad_id: int
    eos_id: int

    def encode(self, text: str, add_special: bool = True) -> list[int]: ...

    def decode(self, ids: Sequence[int]) -> str: ...

    def encode_pair(self, a: str, b: str, max_len: int) -> list[int]: ...


class HashWordTokenizer:
    """Deterministic word-hash tokenizer.

    ids: 0=pad, 1=cls/bos, 2=sep/eos, 3=unk; words hash into [n_special,
    vocab). Decoding uses a session-local reverse map (sufficient for
    round-tripping text this process produced, e.g. LLM echo paths).
    """

    n_special = 4

    def __init__(self, vocab_size: int = 30000):
        self.vocab_size = vocab_size
        self.pad_id = 0
        self.cls_id = 1
        self.sep_id = 2
        self.unk_id = 3
        self.eos_id = self.sep_id
        self._reverse: dict[int, str] = {}

    def _word_id(self, word: str) -> int:
        h = hashlib.blake2s(word.encode(), digest_size=8).digest()
        wid = self.n_special + int.from_bytes(h, "little") % (
            self.vocab_size - self.n_special
        )
        self._reverse.setdefault(wid, word)
        return wid

    def tokenize_words(self, text: str) -> list[str]:
        return _WORD_RE.findall(text.lower())

    def encode(self, text: str, add_special: bool = True) -> list[int]:
        ids = [self._word_id(w) for w in self.tokenize_words(text)]
        if add_special:
            return [self.cls_id, *ids, self.sep_id]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        words = [
            self._reverse.get(int(i), "<unk>")
            for i in ids
            if int(i) >= self.n_special
        ]
        return " ".join(words)

    def encode_pair(self, a: str, b: str, max_len: int) -> list[int]:
        """RoBERTa pair layout: <s> a </s></s> b </s>, truncating ``b``."""
        ia = [self._word_id(w) for w in self.tokenize_words(a)]
        ib = [self._word_id(w) for w in self.tokenize_words(b)]
        budget = max_len - len(ia) - 4
        ib = ib[: max(budget, 0)]
        out = [self.cls_id, *ia, self.sep_id, self.sep_id, *ib, self.sep_id]
        return out[:max_len]


class HFTokenizer:
    """Adapter over a local HuggingFace tokenizer directory (no downloads)."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer  # local files only

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.vocab_size = self._tok.vocab_size
        self.cls_id = self._tok.cls_token_id or self._tok.bos_token_id or 0
        self.sep_id = self._tok.sep_token_id or self._tok.eos_token_id or 0
        self.pad_id = self._tok.pad_token_id or 0
        self.eos_id = self._tok.eos_token_id or self.sep_id

    def encode(self, text: str, add_special: bool = True) -> list[int]:
        return self._tok.encode(text, add_special_tokens=add_special)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=True)

    def encode_pair(self, a: str, b: str, max_len: int) -> list[int]:
        return self._tok.encode(
            a, b, truncation="only_second", max_length=max_len
        )


def get_tokenizer(checkpoint_path: str | None = None,
                  vocab_size: int = 30000) -> Tokenizer:
    """HF tokenizer when a local checkpoint dir provides one, else hash."""
    if checkpoint_path:
        try:
            return HFTokenizer(checkpoint_path)
        except Exception:
            pass
    return HashWordTokenizer(vocab_size)


def pad_batch(
    seqs: list[list[int]], max_len: int, pad_id: int
) -> tuple["np.ndarray", "np.ndarray"]:
    """Pad to (B, max_len) int32 + attention mask."""
    import numpy as np

    B = len(seqs)
    out = np.full((B, max_len), pad_id, np.int32)
    mask = np.zeros((B, max_len), np.int32)
    for i, s in enumerate(seqs):
        s = s[:max_len]
        out[i, : len(s)] = s
        mask[i, : len(s)] = 1
    return out, mask


_STRIP = ".,;:!?()[]\"'"


def norm_tokens(text: str) -> list[str]:
    """Lowercased whitespace tokens with edge punctuation stripped.

    Shared by the store's lexical stats (:meth:`TPUVectorStore.term_stats`)
    and PRF expansion so both sides agree on what a "term" is —
    contextual headers wrap terms as ``[Context: near: a, b]`` and
    unstripped tokens like ``b]`` hash differently from ``b``, corrupting
    df statistics and producing unusable expansion terms.
    """
    out = []
    for w in text.lower().split():
        w = w.strip(_STRIP)
        if w:
            out.append(w)
    return out
