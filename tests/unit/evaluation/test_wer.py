"""WER metric unit tests (the reference has no WER implementation to
mirror — docs/COMPARISON.md:59-67 cites published numbers only — so these
pin the standard Levenshtein semantics)."""

import pytest

from audio_rag_tpu.evaluation.wer import aggregate_wer, wer, wer_counts


class TestWER:
    def test_exact_match(self):
        assert wer("the cat sat", "the cat sat") == 0.0

    def test_case_and_punct_normalized(self):
        assert wer("The cat, sat!", "the cat sat") == 0.0

    def test_substitution(self):
        c = wer_counts("the cat sat", "the dog sat")
        assert (c.substitutions, c.deletions, c.insertions) == (1, 0, 0)
        assert c.wer == pytest.approx(1 / 3)

    def test_deletion(self):
        c = wer_counts("the cat sat", "the sat")
        assert (c.substitutions, c.deletions, c.insertions) == (0, 1, 0)

    def test_insertion(self):
        c = wer_counts("the cat", "the big cat")
        assert (c.substitutions, c.deletions, c.insertions) == (0, 0, 1)
        assert c.wer == pytest.approx(0.5)

    def test_all_wrong(self):
        assert wer("a b c", "x y z") == 1.0

    def test_wer_can_exceed_one(self):
        assert wer("a", "x y z") == 3.0

    def test_empty_hypothesis(self):
        c = wer_counts("a b", "")
        assert c.deletions == 2 and c.wer == 1.0

    def test_empty_reference(self):
        assert wer_counts("", "a b").insertions == 2

    def test_mixed_alignment(self):
        # ref: "a b c d" hyp: "a x c" → 1 sub (b→x) + 1 del (d)
        c = wer_counts("a b c d", "a x c")
        assert (c.substitutions, c.deletions, c.insertions) == (1, 1, 0)
        assert c.wer == pytest.approx(0.5)

    def test_aggregate_pools_edits(self):
        # 1 error / 10 words and 3 errors / 2 words → 4/12, not mean(0.1, 1.5)
        total = aggregate_wer([
            ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
             "w1 w2 w3 w4 w5 w6 w7 w8 w9 bad"),
            ("a b", "x y z"),
        ])
        assert total.n_ref == 12
        assert total.errors == 4
        assert total.wer == pytest.approx(4 / 12)
