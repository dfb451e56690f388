"""Tests for layer L2: statistics, evaluation harness, reward fitting.

Mirrors the reference's system-level acceptance (test_ldpc.py:25: the BER
waterfall must reach zero at the high-SNR points) plus golden checks of the
reward pipeline against the reference's near-earth baselines
(postProcessing.py:18-19).
"""

import numpy as np
import pytest

from ldpc_tpu.codes import near_earth_code, wifi_code
from ldpc_tpu.sim import (BerStatistics, calc_reward, evaluate_code,
                          evaluate_epsilon_probe, recursive_linear_fit,
                          snr_db_actual)


def test_ber_statistics_roundtrip():
    st = BerStatistics(100)
    st.add_entry(3.0, 0.5, 0.51, 10, 2, 7, 50, True)
    st.add_entry(3.0, 0.5, 0.49, 12, 0, 3, 50, True)
    st.add_entry(3.5, 0.4, 0.41, 5, 5, 50, 50, False)
    assert len(st) == 3
    (s_snr, s_ber, s_itr, axis, avg_snr, ber, avg_itr) = st.get_stats_v2()
    assert np.array_equal(axis, [3.0, 3.5])
    np.testing.assert_allclose(ber, [(2 + 0) / (2 * 100), 5 / 100])
    np.testing.assert_allclose(avg_itr, [5.0, 50.0])
    assert s_ber.shape == (3,)
    # realized snr matches the inverse of sigma formula (common.py:152-155)
    np.testing.assert_allclose(
        s_snr[0], 10 * np.log10(1 / (2 * 0.51 ** 2)))


def test_ber_statistics_union_add_merge():
    a, b = BerStatistics(10), BerStatistics(10)
    a.add_entry(3.2, 0.4, 0.4, 1, 1, 5, 50, True)
    b.add_entry(3.0, 0.5, 0.5, 2, 2, 9, 50, True)
    u = a.union(b)
    assert len(u) == 2
    assert u.column("snr")[0] == 3.0  # union sorts (common.py:167-172)
    c = a.add(b)
    assert list(c.column("snr")) == [3.2, 3.0]  # add keeps order


def test_ber_statistics_batch_and_fer():
    st = BerStatistics(100)
    st.add_batch(np.full(4, 3.0), np.full(4, 0.5), np.full(4, 0.5),
                 np.array([5, 6, 7, 8]), np.array([0, 0, 3, 0]),
                 np.array([2, 3, 50, 4]), 50,
                 np.array([True, True, False, True]))
    axis, fer = st.frame_error_rate()
    np.testing.assert_allclose(fer, [0.25])
    s = st.summary()
    assert s["transmissions"] == 4
    np.testing.assert_allclose(s["avg_iterations"], [59 / 4])


def test_recursive_linear_fit_drops_below_trend():
    x = np.array([3.0, 3.2, 3.4, 3.6, 3.8])
    y = np.array([0.03, 0.02, 0.01, 0.0, 0.0])
    xs, ys, p, trend, _ = recursive_linear_fit(x, y)
    assert xs.size <= x.size
    assert p[0] < 0  # negative slope


def test_calc_reward_near_reference_baseline():
    """Synthetic near-earth-like scatter must land near the reference
    reward baseline 0.3965 for the 3.0-3.4 sweep (postProcessing.py:19).

    The reference fit on the real code's scatter yields ~= the area of
    (1 - fitted line); with the reference's BER points the value is close
    to integrating 1 - linear(BER)."""
    # reference scatter: four SNR points with the BERs of common.py:112-114
    snr = np.array([2.9914, 3.1541, 3.3076, 3.4404])
    ber = np.array([2.354e-2, 1.359e-2, 1.079e-2, 0.0])
    r = calc_reward(snr, ber, snr_points=[3.0, 3.4])
    assert abs(r - 0.3965108116285836) < 0.02


def test_calc_reward_bad_candidate():
    assert calc_reward([3.0], [0.5], [3.0, 3.4]) == -2.0


def test_evaluate_epsilon_probe_near_earth():
    """Deterministic probe: the reference's reproducibility entry point
    (ldpcCUDA.py:677). One flip + small epsilon must decode to zero."""
    code = near_earth_code()
    unc, dec, iters, ok = evaluate_epsilon_probe(code, epsilon=1e-2,
                                                 flips=(0,), max_iters=20)
    assert unc == 1 and dec == 0 and ok and iters <= 3
    # return_time=True appends the decode wall time, matching the
    # reference's 4-tuple + time (ldpcCUDA.py:826-828)
    unc2, dec2, iters2, ok2, wall = evaluate_epsilon_probe(
        code, epsilon=1e-2, flips=(0,), max_iters=20, return_time=True)
    assert (unc2, dec2, iters2, ok2) == (unc, dec, iters, ok)
    assert wall > 0.0


def test_evaluate_code_waterfall_wifi():
    """System acceptance a la test_ldpcCUDAdecoder (test_ldpc.py:25):
    BER must hit zero at the two highest SNR points."""
    wifi = wifi_code()
    stats = evaluate_code(wifi, [2.0, 3.5, 4.0], num_transmissions=24,
                          max_iters=30, batch_size=12, seed=99)
    (_, _, _, axis, avg_snr, ber, avg_itr) = stats.get_stats_v2()
    assert ber[-1] == 0 and ber[-2] == 0
    assert ber[0] > 0
    assert avg_itr[-1] < avg_itr[0]
    # realized SNR tracks nominal
    np.testing.assert_allclose(avg_snr, axis, atol=0.2)


def test_evaluate_code_early_abort():
    wifi = wifi_code()
    stats = evaluate_code(wifi, [0.0, 3.5, 4.0], num_transmissions=8,
                          max_iters=10, batch_size=8, seed=5,
                          early_abort_ber=1e-4)
    # first point is terrible -> sweep aborts, later points never run
    assert np.array_equal(stats.snr_points, [0.0])


def test_evaluate_code_stats_merge_across_calls():
    wifi = wifi_code()
    a = evaluate_code(wifi, [4.0], 8, max_iters=10, batch_size=4, seed=1)
    b = evaluate_code(wifi, [4.5], 8, max_iters=10, batch_size=4, seed=2)
    merged = a.union(b)
    assert len(merged) == 16
    assert list(merged.snr_points) == [4.0, 4.5]


def test_staged_decode_exactness():
    """Two-phase decode must be bit-identical to single-pass decode
    (errors, iterations, success per word)."""
    import jax
    from ldpc_tpu.ops import decode
    from ldpc_tpu.sim import transmit_zero_codeword
    from ldpc_tpu.sim.evaluate import staged_decode_counts
    wifi = wifi_code()
    noisy, _, _ = transmit_zero_codeword(jax.random.key(4), 24, wifi.n, 2.2)
    ref = decode(wifi, noisy, max_iters=25)
    e, it, ok = staged_decode_counts(wifi, noisy, 25, phase1_iters=4,
                                     pad_to=8)
    assert np.array_equal(e, np.asarray(ref.hard, np.int64).sum(1))
    assert np.array_equal(it, np.asarray(ref.iterations))
    assert np.array_equal(ok, np.asarray(ref.success))


def test_evaluate_code_staged_matches_direct():
    wifi = wifi_code()
    a = evaluate_code(wifi, [2.5, 4.0], 16, max_iters=20, batch_size=8,
                      seed=42)
    b = evaluate_code(wifi, [2.5, 4.0], 16, max_iters=20, batch_size=8,
                      seed=42, staged=True, phase1_iters=4)
    (_, _, _, ax_a, _, ber_a, itr_a) = a.get_stats_v2()
    (_, _, _, ax_b, _, ber_b, itr_b) = b.get_stats_v2()
    np.testing.assert_allclose(ber_a, ber_b)
    np.testing.assert_allclose(itr_a, itr_b)


def test_evaluate_code_layered_needs_pallas():
    # layered needs the pallas kernel: the XLA engine refuses loudly
    # (instead of silently decoding with the flooding schedule)
    wifi = wifi_code()
    with pytest.raises(ValueError, match="pallas"):
        evaluate_code(wifi, [3.0], 8, max_iters=10, engine="xla",
                      schedule="layered")
    with pytest.raises(ValueError, match="pallas"):
        evaluate_code(wifi, [3.0], 8, max_iters=10, engine="xla",
                      tile_b=128)


@pytest.mark.slow
def test_evaluate_code_unstaged_honors_engine_and_schedule():
    """``staged=False`` routes through the same builder as the staged
    path (empty cascade), so ``engine``/``schedule`` are honored instead
    of silently dropped; per-word latching then makes the unstaged pallas
    layered sweep bit-identical to the staged one."""
    wifi = wifi_code()
    kw = dict(max_iters=12, batch_size=8, seed=5, engine="pallas",
              schedule="layered")
    # different codeword tiles on the two sides: per-word results must be
    # tile-invariant (the tile only partitions the kernel grid)
    a = evaluate_code(wifi, [3.0], 16, staged=False, tile_b=2, **kw)
    b = evaluate_code(wifi, [3.0], 16, staged=True, phase1_iters=[4], **kw)
    sa, sb = a.summary(), b.summary()
    np.testing.assert_array_equal(sa["ber"], sb["ber"])
    np.testing.assert_allclose(sa["avg_iterations"], sb["avg_iterations"],
                               rtol=1e-6)


def test_stats_save_load_roundtrip(tmp_path):
    st = BerStatistics(50)
    st.add_entry(3.0, 0.5, 0.5, 3, 1, 7, 50, True)
    st.save(tmp_path / "s.npz")
    back = BerStatistics.load(tmp_path / "s.npz")
    assert back.codeword_size == 50 and len(back) == 1
    np.testing.assert_allclose(back.column("errors_decoded"), [1])


def test_evaluate_code_checkpoint_resume(tmp_path):
    """Interrupted sweep resumes by skipping completed SNR points."""
    wifi = wifi_code()
    ckpt = tmp_path / "sweep.npz"
    a = evaluate_code(wifi, [3.5], 8, max_iters=10, batch_size=4, seed=1,
                      checkpoint_path=ckpt)
    assert ckpt.exists()
    # "restart": same call with an extra point only runs the new point
    b = evaluate_code(wifi, [3.5, 4.0], 8, max_iters=10, batch_size=4,
                      seed=1, checkpoint_path=ckpt)
    assert len(b) == 16
    assert list(b.snr_points) == [3.5, 4.0]
    # the 3.5-point rows are the checkpointed originals
    np.testing.assert_allclose(
        np.sort(b.column("errors_decoded")[b.column("snr") == 3.5]),
        np.sort(a.column("errors_decoded")))


def test_throughput_timer_and_roofline():
    from ldpc_tpu.utils.profiling import ThroughputTimer, device_roofline
    t = ThroughputTimer()
    with t.span(bits=100):
        pass
    assert t.spans == 1 and t.total_bits == 100
    info = device_roofline()
    assert "device_kind" in info


@pytest.mark.slow
def test_device_staged_matches_host_staged_and_direct():
    """The single-dispatch device-staged decoder returns exactly the
    host-staged (== single-pass) results in both cond branches."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.ops.decoder import decode
    from ldpc_tpu.sim.channel import transmit_zero_codeword
    from ldpc_tpu.sim.evaluate import make_staged_decoder_device

    wifi = wifi_code()
    B = 24
    for snr, p1 in ((3.2, 4), (1.6, 4)):   # few-failures / many-failures
        llr, _, _ = transmit_zero_codeword(jax.random.key(17), B, wifi.n,
                                           jnp.full((B,), snr, jnp.float32))
        staged = make_staged_decoder_device(wifi, 20, phase1_iters=p1,
                                            redo_capacity=8)
        e, it, ok = [np.asarray(v) for v in staged(llr)]
        ref = decode(wifi, llr, 20)
        assert np.array_equal(e, np.asarray(ref.hard).sum(axis=1))
        assert np.array_equal(it, np.asarray(ref.iterations))
        assert np.array_equal(ok, np.asarray(ref.success))


def test_device_staged_word_zero_failure_not_clobbered():
    """Regression: padding entries of the phase-2 gather must not race
    word 0's scatter write (duplicate scatter order is unspecified).
    Build a batch whose FIRST word fails phase 1 and verify its phase-2
    result survives."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.ops.decoder import decode
    from ldpc_tpu.sim.channel import transmit_zero_codeword
    from ldpc_tpu.sim.evaluate import make_staged_decoder_device

    wifi = wifi_code()
    B = 16
    # harsh word 0, easy rest
    snr = jnp.concatenate([jnp.full((1,), 1.2), jnp.full((B - 1,), 5.0)])
    llr, _, _ = transmit_zero_codeword(jax.random.key(3), B, wifi.n,
                                       snr.astype(jnp.float32))
    ref = decode(wifi, llr, 25)
    assert not bool(ref.success[0]) or int(ref.iterations[0]) > 2
    staged = make_staged_decoder_device(wifi, 25, phase1_iters=2,
                                        redo_capacity=8)
    e, it, ok = [np.asarray(v) for v in staged(llr)]
    assert np.array_equal(e, np.asarray(ref.hard).sum(axis=1))
    assert np.array_equal(it, np.asarray(ref.iterations))
    assert np.array_equal(ok, np.asarray(ref.success))


@pytest.mark.slow
def test_device_staged_layered_matches_single_pass_layered():
    """A staged layered decode equals the single-pass layered kernel
    (same latching argument as flooding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.ops.pallas_static import make_static_sweep_decoder
    from ldpc_tpu.sim.channel import transmit_zero_codeword
    from ldpc_tpu.sim.evaluate import make_staged_decoder_device

    wifi = wifi_code()
    B = 8
    llr, _, _ = transmit_zero_codeword(jax.random.key(23), B, wifi.n, 2.4)
    single = make_static_sweep_decoder(wifi, 16, tile_b=4,
                                       store_dtype=jnp.float32,
                                       schedule="layered", interpret=True)
    e0, it0, ok0 = [np.asarray(v) for v in single(llr)]
    staged = make_staged_decoder_device(
        wifi, 16, phase1_iters=3, redo_capacity=4, engine="pallas",
        store_dtype=jnp.float32, schedule="layered")
    e1, it1, ok1 = [np.asarray(v) for v in staged(llr)]
    assert np.array_equal(e0, e1)
    assert np.array_equal(it0, it1)
    assert np.array_equal(ok0, ok1)


def test_device_staged_multi_stage_cascade_exact():
    """A 3-stage cascade (phase_iters sequence) equals the single-pass
    decode exactly — per-word latching composes across any number of
    re-decode stages, in both capacity branches."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.ops.decoder import decode
    from ldpc_tpu.sim.channel import transmit_zero_codeword
    from ldpc_tpu.sim.evaluate import make_staged_decoder_device

    wifi = wifi_code()
    B = 24
    for snr, caps in ((3.0, (8, 4)), (1.4, (4, 4))):
        llr, _, _ = transmit_zero_codeword(jax.random.key(29), B, wifi.n,
                                           jnp.full((B,), snr, jnp.float32))
        staged = make_staged_decoder_device(wifi, 20, phase1_iters=(3, 8),
                                            redo_capacity=caps)
        e, it, ok = [np.asarray(v) for v in staged(llr)]
        ref = decode(wifi, llr, 20)
        assert np.array_equal(e, np.asarray(ref.hard).sum(axis=1))
        assert np.array_equal(it, np.asarray(ref.iterations))
        assert np.array_equal(ok, np.asarray(ref.success))


def test_fused_sweep_matches_transmit_plus_staged():
    """make_staged_sweep_device (transmit + staged cascade in ONE
    dispatch) returns exactly the same per-word results and channel
    stats as transmitting and staged-decoding separately with the same
    key — fusion must be a dispatch-count optimization only."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.sim.evaluate import (_transmit_fn,
                                       make_staged_decoder_device,
                                       make_staged_sweep_device)

    wifi = wifi_code()
    B = 24
    key = jax.random.key(41)
    snr = jnp.full((B,), 3.0, jnp.float32)
    fused = make_staged_sweep_device(wifi, 20, phase1_iters=4,
                                     redo_capacity=8)
    out = {k: np.asarray(v) for k, v in fused(key, snr).items()}

    transmit = _transmit_fn(wifi.n, scale_llr=False)
    llr, sigma, sigma_actual, unc = transmit(key, snr)
    staged = make_staged_decoder_device(wifi, 20, phase1_iters=4,
                                        redo_capacity=8)
    e, it, ok = staged(llr)
    assert np.array_equal(out["errors_decoded"], np.asarray(e))
    assert np.array_equal(out["iterations"], np.asarray(it))
    assert np.array_equal(out["success"], np.asarray(ok))
    assert np.array_equal(out["errors_uncoded"], np.asarray(unc))
    np.testing.assert_allclose(out["sigma"], np.asarray(sigma))
    np.testing.assert_allclose(out["sigma_actual"], np.asarray(sigma_actual))


def test_random_codeword_sweep_matches_all_zero():
    """VERDICT r3 #5: the G-based random-codeword sweep (encode real
    messages, count errors vs the transmitted word) must agree with the
    all-zero protocol — zero BER where the zero run has zero, and BER
    within the combined Monte-Carlo band at an operating point."""
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.sim.evaluate import evaluate_code

    code = wifi_code()
    kw = dict(snr_points=[2.5, 4.5], num_transmissions=192, max_iters=12,
              batch_size=96, seed=17)
    zero = evaluate_code(code, **kw).summary()
    rand = evaluate_code(code, codewords="random", **kw).summary()
    # high-SNR point: both decode everything
    assert zero["ber"][1] == 0.0 and rand["ber"][1] == 0.0
    # operating point: same BER within ~4 sigma of the per-word error
    # spread (loose: one assertion, no flakes)
    n_bits = 192 * code.n
    z_ber, r_ber = zero["ber"][0], rand["ber"][0]
    assert z_ber > 0  # the point is informative
    band = 4 * ((z_ber + r_ber) * 20 / n_bits) ** 0.5 + 8 / n_bits
    assert abs(z_ber - r_ber) < band + 0.5 * max(z_ber, r_ber)
    # the random path really transmitted non-zero codewords: its decoder
    # SUCCESS words carry no bit errors only if errors were counted vs
    # the true transmitted word AND encode/H agree — already covered by
    # the BER agreement above; sanity-check uncoded errors exist
    assert rand["transmissions"] == 2 * 192


def test_random_codeword_rejects_pallas_and_staged():
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.sim.evaluate import evaluate_code
    import pytest as _pytest
    with _pytest.raises(ValueError):
        evaluate_code(wifi_code(), [4.0], 4, 8, codewords="random",
                      staged=True)
    with _pytest.raises(ValueError):
        evaluate_code(wifi_code(), [4.0], 4, 8, codewords="random",
                      engine="pallas")


def test_sort_words_bit_identical():
    """Straggler-aware sorted tiling (VERDICT r3 #3) is a pure scheduling
    lever: per-word outputs bit-identical to the unsorted decode, on both
    engines, through the staged cascade."""
    import jax
    import jax.numpy as jnp
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.sim.evaluate import make_staged_sweep_device

    code = wifi_code()
    key = jax.random.key(23)
    snr = jnp.full((16,), 2.8, jnp.float32)
    for engine in ("xla", "pallas"):
        base = make_staged_sweep_device(code, 10, phase1_iters=[4],
                                        engine=engine)
        srt = make_staged_sweep_device(code, 10, phase1_iters=[4],
                                       engine=engine, sort_words=True)
        a = jax.device_get(base(key, snr))
        b = jax.device_get(srt(key, snr))
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]),
                err_msg=f"{engine}:{k}")
