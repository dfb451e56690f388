"""Tests for the native C++ host engine (ldpc_tpu/native)."""

import numpy as np
import pytest

from ldpc_tpu.codes import wifi_code
from ldpc_tpu.ops import dense_min_sum_decode

native = pytest.importorskip("ldpc_tpu.native")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_native_matches_numpy_oracle():
    wifi = wifi_code()
    h = wifi.to_dense(np.int8)
    rng = np.random.RandomState(11)
    llrs = (-1.0 + rng.normal(0, 0.45, (6, wifi.n)))
    hard, soft, iters, ok = native.native_min_sum_decode(h, llrs, 25)
    for i in range(6):
        oh, osf, oit, ook = dense_min_sum_decode(h, llrs[i], 25)
        assert ok[i] == ook and iters[i] == oit
        assert np.array_equal(hard[i], oh)
        np.testing.assert_allclose(soft[i], osf, rtol=1e-12, atol=1e-12)


def test_native_single_word_shape():
    wifi = wifi_code()
    h = wifi.to_dense(np.int8)
    llr = np.full(wifi.n, -1.0)
    hard, soft, iters, ok = native.native_min_sum_decode(h, llr, 5)
    assert hard.shape == (1, wifi.n) and iters[0] == 0 and ok[0]


def test_native_is_much_faster_than_numpy():
    import time
    wifi = wifi_code()
    h = wifi.to_dense(np.int8)
    rng = np.random.RandomState(3)
    llrs = (-1.0 + rng.normal(0, 0.5, (4, wifi.n)))
    t0 = time.time()
    native.native_min_sum_decode(h, llrs, 20)
    t_native = time.time() - t0
    t0 = time.time()
    for i in range(4):
        dense_min_sum_decode(h, llrs[i], 20)
    t_numpy = time.time() - t0
    assert t_native < t_numpy  # typically 50-200x faster
