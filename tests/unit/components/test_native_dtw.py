"""Native word-timestamp kernels (arag_dtw_path / arag_median_filter)
must be BIT-IDENTICAL to the numpy implementations they accelerate —
word timings feed alignment and chunk boundaries, so any drift would
silently shift the whole downstream pipeline."""

import numpy as np
import pytest

from audio_rag_tpu import native
from audio_rag_tpu.asr import word_timing as wt

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason="native lib unavailable (no toolchain)",
)

SHAPES = [(260, 1500), (224, 1500), (5, 9), (1, 7), (13, 4), (2, 2)]


def _numpy_dtw(cost):
    """The numpy anti-diagonal implementation, native path disabled."""
    orig = native.dtw_path
    native.dtw_path = lambda c: None
    try:
        return wt.dtw_path(cost)
    finally:
        native.dtw_path = orig


def _numpy_median(x, width):
    pad = width // 2
    xp = np.pad(x, [(0, 0), (pad, pad)], mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(win, axis=-1)


class TestNativeDTW:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_path_matches_numpy(self, shape):
        rng = np.random.default_rng(hash(shape) % 2**31)
        cost = rng.standard_normal(shape).astype(np.float32)
        nt, nf = native.dtw_path(cost)
        rt, rf = _numpy_dtw(cost)
        np.testing.assert_array_equal(nt, rt)
        np.testing.assert_array_equal(nf, rf)

    def test_ties_broken_identically(self):
        # constant cost = every step ties; tie-break order is the contract
        cost = np.zeros((6, 11), np.float32)
        nt, nf = native.dtw_path(cost)
        rt, rf = _numpy_dtw(cost)
        np.testing.assert_array_equal(nt, rt)
        np.testing.assert_array_equal(nf, rf)

    def test_endpoints(self):
        cost = np.random.default_rng(0).random((8, 30)).astype(np.float32)
        ti, fi = native.dtw_path(cost)
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == 7 and fi[-1] == 29
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()


class TestNativeMedian:
    @pytest.mark.parametrize("shape", [(260, 1500), (3, 9), (1, 7)])
    @pytest.mark.parametrize("width", [3, 7, 11])
    def test_matches_numpy(self, shape, width):
        if shape[1] < width:
            pytest.skip("window wider than row")
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32)
        out = native.median_filter(x, width)
        ref = _numpy_median(x, width).astype(np.float32)
        np.testing.assert_array_equal(out, ref)

    def test_narrow_row_passthrough(self):
        x = np.ones((2, 3), np.float32)
        assert np.array_equal(wt._median_filter(x, 7), x)
