"""Differential tests: TPU decoder vs the reference-semantics numpy oracle.

The oracle (``ldpc_tpu.ops.oracle``) replicates ``ldpc.py:75-337`` update
rules in float64; the JAX decoder must agree on hard decisions, success
status and iteration counts, and (with keep_soft) track soft values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import QCCode, near_earth_code, wifi_code
from ldpc_tpu.ops import (DecodePlan, decode, decoder_for_code,
                          dense_min_sum_decode, make_decoder, syndrome_ok)
from ldpc_tpu.sim.channel import (awgn, epsilon_probe, modulate, slicer,
                                  snr_db_to_sigma, transmit_zero_codeword)


def toy_code():
    # Small irregular QC code: z=5, 2x3 blocks, mixed degrees incl. a zero
    # block — exercises masking/padding paths.
    return QCCode(z=5, shifts=(((0, 2), (1,), (3,)), ((4,), (), (0, 1))))


@pytest.fixture(scope="module")
def wifi():
    return wifi_code()


def _oracle_batch(h, llrs, max_iters):
    outs = [dense_min_sum_decode(h, row, max_iters) for row in llrs]
    hard = np.stack([o[0] for o in outs])
    soft = np.stack([o[1] for o in outs])
    iters = np.array([o[2] for o in outs])
    ok = np.array([o[3] for o in outs])
    return hard, soft, iters, ok


def test_plan_structure_near_earth():
    plan = DecodePlan.from_code(near_earth_code())
    assert (plan.block_rows, plan.block_cols, plan.z) == (2, 16, 511)
    assert plan.dmax_cn == 32 and plan.dmax_vn == 4
    assert plan.cn_valid.all() and plan.vn_valid.all()


def test_plan_structure_toy_irregular():
    plan = DecodePlan.from_code(toy_code())
    assert plan.dmax_cn == 4 and (~plan.cn_valid[1]).sum() == 1
    assert plan.dmax_vn == 3
    # vn slots cover every edge exactly once
    assert plan.vn_valid.sum() == plan.cn_valid.sum() == 7


def test_zero_noise_converges_immediately(wifi):
    llr = jnp.full((4, wifi.n), -1.0)  # clean all-zero codeword
    res = decode(wifi, llr, max_iters=10)
    assert bool(res.success.all())
    assert np.array_equal(np.asarray(res.iterations), np.zeros(4))
    assert not np.asarray(res.hard).any()


def test_single_flip_matches_oracle_near_earth():
    code = near_earth_code()
    h = code.to_dense(np.int8)
    probe = epsilon_probe(code.n, flips=(0,))
    o_hard, o_soft, o_it, o_ok = _oracle_batch(
        h, np.asarray(probe, np.float64), 20)
    res = decode(code, probe, max_iters=20, keep_soft=True)
    assert bool(res.success[0]) == bool(o_ok[0])
    assert int(res.iterations[0]) == int(o_it[0])
    assert np.array_equal(np.asarray(res.hard[0]), o_hard[0])
    np.testing.assert_allclose(np.asarray(res.soft[0]), o_soft[0],
                               rtol=1e-5, atol=1e-5)


def test_awgn_batch_matches_oracle_wifi(wifi):
    """Operating-point batch: status/iterations/hard must match the oracle
    for every word that converges; fp32-vs-fp64 trajectories of words that
    never converge drift chaotically over many iterations, so those only
    need matching status."""
    h = wifi.to_dense(np.int8)
    key = jax.random.key(17)
    noisy, _, _ = transmit_zero_codeword(key, 12, wifi.n, 4.5)
    noisy_np = np.asarray(noisy, np.float64)
    o_hard, o_soft, o_it, o_ok = _oracle_batch(h, noisy_np, 30)
    res = decode(wifi, noisy, max_iters=30, keep_soft=True)
    assert o_ok.sum() >= 8  # the SNR point must actually exercise decoding
    assert np.array_equal(np.asarray(res.success), o_ok)
    assert np.array_equal(np.asarray(res.iterations), o_it)
    conv = o_ok
    assert np.array_equal(np.asarray(res.hard)[conv], o_hard[conv])
    np.testing.assert_allclose(np.asarray(res.soft)[conv], o_soft[conv],
                               rtol=1e-3, atol=1e-3)


def test_awgn_short_horizon_soft_tracks_oracle_wifi(wifi):
    """At few iterations fp32 tracks the fp64 oracle tightly for every
    word, converged or not."""
    h = wifi.to_dense(np.int8)
    key = jax.random.key(23)
    noisy, _, _ = transmit_zero_codeword(key, 6, wifi.n, 3.0)
    noisy_np = np.asarray(noisy, np.float64)
    _, o_soft, o_it, o_ok = _oracle_batch(h, noisy_np, 4)
    res = decode(wifi, noisy, max_iters=4, keep_soft=True)
    assert np.array_equal(np.asarray(res.iterations), o_it)
    np.testing.assert_allclose(np.asarray(res.soft), o_soft,
                               rtol=2e-4, atol=2e-4)


def test_awgn_matches_oracle_toy_irregular():
    code = toy_code()
    h = code.to_dense(np.int8)
    rng = np.random.RandomState(5)
    noisy = (-1.0 + rng.normal(0, 0.7, (32, code.n))).astype(np.float32)
    o_hard, _, o_it, o_ok = _oracle_batch(h, noisy.astype(np.float64), 25)
    res = decode(code, jnp.asarray(noisy), max_iters=25)
    assert np.array_equal(np.asarray(res.success), o_ok)
    assert np.array_equal(np.asarray(res.iterations), o_it)
    conv = o_ok
    assert conv.sum() >= 16
    assert np.array_equal(np.asarray(res.hard)[conv], o_hard[conv])


def test_decoded_words_are_codewords(wifi):
    h = wifi.to_dense(np.int8)
    key = jax.random.key(3)
    noisy, _, _ = transmit_zero_codeword(key, 16, wifi.n, 4.0)
    res = decode(wifi, noisy, max_iters=50)
    hard = np.asarray(res.hard)
    for i in range(16):
        if bool(res.success[i]):
            assert syndrome_ok(h, hard[i])


def test_batch_composition_invariance(wifi):
    """Decoding words together == decoding them in sub-batches."""
    key = jax.random.key(11)
    noisy, _, _ = transmit_zero_codeword(key, 8, wifi.n, 3.0)
    full = decode(wifi, noisy, max_iters=20)
    a = decode(wifi, noisy[:3], max_iters=20)
    b = decode(wifi, noisy[3:], max_iters=20)
    assert np.array_equal(np.asarray(full.hard),
                          np.concatenate([a.hard, b.hard]))
    assert np.array_equal(np.asarray(full.iterations),
                          np.concatenate([a.iterations, b.iterations]))


@pytest.mark.parametrize("kind", ["sum-product", "normalized-min-sum",
                                  "offset-min-sum"])
def test_decoder_variants_correct_errors(wifi, kind):
    key = jax.random.key(29)
    sigma = snr_db_to_sigma(4.0)
    noisy, _, _ = transmit_zero_codeword(key, 8, wifi.n, 4.0)
    llr = 2.0 * noisy / sigma**2   # true LLRs (sum-product needs scaling)
    res = decode(wifi, llr, max_iters=50, kind=kind)
    uncoded_errors = int((np.asarray(noisy) > 0).sum())
    decoded_errors = int(np.asarray(res.hard).sum())
    assert uncoded_errors > 0
    assert decoded_errors < uncoded_errors
    assert int(res.success.sum()) >= 6


def test_channel_statistics():
    key = jax.random.key(0)
    noisy, sigma, sigma_actual = transmit_zero_codeword(key, 4, 8176, 3.0)
    expected = float(np.sqrt(0.5 / 10 ** 0.3))
    np.testing.assert_allclose(np.asarray(sigma), expected, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma_actual), expected, rtol=0.05)
    assert noisy.shape == (4, 8176)


def test_modulate_slicer_roundtrip():
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, (3, 64))
    assert np.array_equal(np.asarray(slicer(modulate(bits))), bits)


def test_bfloat16_decoder_runs(wifi):
    key = jax.random.key(5)
    noisy, _, _ = transmit_zero_codeword(key, 8, wifi.n, 4.5)
    res = decode(wifi, noisy, max_iters=30, dtype=jnp.bfloat16)
    assert int(res.success.sum()) >= 6


def test_odd_degree_checks_decode_correctly(wifi):
    """802.11n has 81 checks of odd degree 19.  The reference's raw
    sign-product rule is inverted for odd-degree checks in its LLR
    convention (ldpc.py:135-141 — invisible on near-earth whose checks all
    have even degree 32; the reference wifi path is 'decommissioned',
    ldpc.py:505).  Our decoder runs the standard convention internally and
    must trivially correct a single hard flip."""
    probe = epsilon_probe(wifi.n, flips=(7,))
    res = decode(wifi, probe, max_iters=10)
    assert bool(res.success[0])
    assert int(res.iterations[0]) <= 2
    assert not np.asarray(res.hard).any()


def test_max_iters_cap(wifi):
    """At hopeless SNR the decoder must stop at max_iters, not converge."""
    key = jax.random.key(7)
    noisy, _, _ = transmit_zero_codeword(key, 4, wifi.n, -2.0)
    res = decode(wifi, noisy, max_iters=5)
    assert np.array_equal(np.asarray(res.iterations),
                          np.full(4, 5)) or bool(res.success.any())
    assert int(res.iterations.max()) <= 5


def test_dynamic_decoder_matches_static(wifi):
    """The structure-generic decoder (runtime shift tables) must produce
    identical results to the static-plan decoder, including on a mutated
    code, WITHOUT recompiling between codes."""
    from ldpc_tpu.ops.dynamic import dynamic_plan, make_dynamic_decoder
    key = jax.random.key(2)
    noisy, _, _ = transmit_zero_codeword(key, 8, wifi.n, 3.5)
    dec = make_dynamic_decoder(wifi.z, wifi.block_rows, wifi.block_cols,
                               dmax_cn=24, dmax_vn=6, max_iters=20)
    res_dyn = dec(dynamic_plan(wifi, 24, 6), noisy)
    res_sta = decode(wifi, noisy, max_iters=20)
    assert np.array_equal(np.asarray(res_dyn.hard), np.asarray(res_sta.hard))
    assert np.array_equal(np.asarray(res_dyn.iterations),
                          np.asarray(res_sta.iterations))
    # mutate a circulant: same compiled fn, new plan arrays
    mutated = wifi.replace_block(0, 0, (3, 77))
    res_dyn2 = dec(dynamic_plan(mutated, 24, 6), noisy)
    res_sta2 = decode(mutated, noisy, max_iters=20)
    assert np.array_equal(np.asarray(res_dyn2.hard),
                          np.asarray(res_sta2.hard))
    assert np.array_equal(np.asarray(res_dyn2.iterations),
                          np.asarray(res_sta2.iterations))
    assert not np.array_equal(np.asarray(res_dyn2.iterations),
                              np.asarray(res_dyn.iterations))


def test_multi_dynamic_decoder_matches_per_plan(wifi):
    """One vmapped dispatch over N candidate codes must equal N separate
    dynamic decodes (the RL candidate axis as a tensor axis; per-word
    latching makes the shared while_loop trip count invisible)."""
    from ldpc_tpu.ops.dynamic import (dynamic_plan, make_dynamic_decoder,
                                      make_multi_dynamic_decoder, stack_plans)
    key = jax.random.key(11)
    codes = [wifi, wifi.replace_block(0, 0, (3, 77)),
             wifi.replace_block(1, 2, (9,))]
    noisy = jnp.stack([
        transmit_zero_codeword(jax.random.fold_in(key, i), 6, wifi.n, 3.2)[0]
        for i in range(len(codes))])
    plans = [dynamic_plan(c, 24, 6) for c in codes]
    multi = make_multi_dynamic_decoder(
        wifi.z, wifi.block_rows, wifi.block_cols, dmax_cn=24, dmax_vn=6,
        max_iters=15)
    res = multi(stack_plans(plans), noisy)
    single = make_dynamic_decoder(
        wifi.z, wifi.block_rows, wifi.block_cols, dmax_cn=24, dmax_vn=6,
        max_iters=15)
    for i, plan in enumerate(plans):
        ref = single(plan, noisy[i])
        assert np.array_equal(np.asarray(res.hard[i]), np.asarray(ref.hard))
        assert np.array_equal(np.asarray(res.iterations[i]),
                              np.asarray(ref.iterations))
        assert np.array_equal(np.asarray(res.success[i]),
                              np.asarray(ref.success))


def test_stack_plans_rejects_mixed_families(wifi):
    from ldpc_tpu.ops.dynamic import dynamic_plan, stack_plans
    with pytest.raises(ValueError):
        stack_plans([dynamic_plan(wifi, 24, 6), dynamic_plan(wifi, 24, 8)])


def test_dynamic_plan_degree_cap_enforced():
    from ldpc_tpu.ops.dynamic import dynamic_plan
    code = toy_code()
    with pytest.raises(ValueError):
        dynamic_plan(code, dmax_cn=2, dmax_vn=2)
