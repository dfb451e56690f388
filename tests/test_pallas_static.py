"""Tests for the fully-unrolled static-rotation Pallas sweep decoder.

Run in interpret mode on the CPU mesh (conftest forces JAX_PLATFORMS=cpu);
the on-hardware equivalence for near-earth at tile_b=128 is exercised by
bench.py and was validated manually on the real chip (see
ops/pallas_static.py docstring for the equivalence contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import near_earth_code, wifi_code
from ldpc_tpu.ops.decoder import decode
from ldpc_tpu.ops.pallas_static import make_static_sweep_decoder
from ldpc_tpu.sim.channel import epsilon_probe, transmit_zero_codeword


@pytest.fixture(scope="module")
def wifi():
    return wifi_code()


@pytest.mark.slow
def test_static_kernel_matches_decoder_wifi(wifi):
    """f32 storage, short horizon: trajectories match the XLA decoder
    exactly (errors, iterations, success), including failed words."""
    for snr in (1.5, 3.2):
        noisy, _, _ = transmit_zero_codeword(jax.random.key(9), 8, wifi.n,
                                             snr)
        ref = decode(wifi, noisy, max_iters=12)
        dec = make_static_sweep_decoder(wifi, max_iters=12, tile_b=4,
                                        store_dtype=jnp.float32,
                                        interpret=True)
        errors, iters, success = dec(noisy)
        assert np.array_equal(np.asarray(ref.hard).sum(axis=1),
                              np.asarray(errors))
        assert np.array_equal(np.asarray(ref.iterations), np.asarray(iters))
        assert np.array_equal(np.asarray(ref.success), np.asarray(success))


@pytest.mark.slow
def test_static_kernel_bf16_statistically_close(wifi):
    """bf16 storage: converged words agree with the bf16 XLA decoder;
    batch-level BER within a small tolerance."""
    noisy, _, _ = transmit_zero_codeword(jax.random.key(3), 8, wifi.n, 2.4)
    ref = decode(wifi, noisy, max_iters=10, dtype=jnp.bfloat16)
    dec = make_static_sweep_decoder(wifi, max_iters=10, tile_b=4,
                                    store_dtype=jnp.bfloat16,
                                    interpret=True)
    errors, iters, success = dec(noisy)
    ref_err = np.asarray(ref.hard).sum(axis=1)
    conv = np.asarray(success) & np.asarray(ref.success)
    assert np.array_equal(np.asarray(errors)[conv], ref_err[conv])
    assert abs(float(np.asarray(errors).sum()) - float(ref_err.sum())) \
        <= 0.02 * wifi.n * 8 + 16


@pytest.mark.slow
def test_static_kernel_epsilon_probe_deterministic(wifi):
    """The reference's deterministic probe (single bit flip,
    ldpc.py:417-418): must correct it in one iteration, zero errors."""
    probe = jnp.tile(epsilon_probe(wifi.n, flips=(7,)), (4, 1))
    dec = make_static_sweep_decoder(wifi, max_iters=6, tile_b=4,
                                    store_dtype=jnp.float32,
                                    interpret=True)
    errors, iters, success = dec(probe)
    ref = decode(wifi, probe, max_iters=6)
    assert np.asarray(success).all()
    assert np.array_equal(np.asarray(errors), np.zeros(4, np.int32))
    assert np.array_equal(np.asarray(iters), np.asarray(ref.iterations))


def test_static_kernel_near_earth_small():
    """Near-earth (z=511, zp=512: exercises the two-roll mod-z fixup) in
    interpret mode on a tiny batch."""
    code = near_earth_code()
    noisy, _, _ = transmit_zero_codeword(jax.random.key(1), 2, code.n, 3.6)
    ref = decode(code, noisy, max_iters=8)
    dec = make_static_sweep_decoder(code, max_iters=8, tile_b=2,
                                    store_dtype=jnp.float32,
                                    interpret=True)
    errors, iters, success = dec(noisy)
    assert np.array_equal(np.asarray(ref.hard).sum(axis=1),
                          np.asarray(errors))
    assert np.array_equal(np.asarray(ref.iterations), np.asarray(iters))
    assert np.array_equal(np.asarray(ref.success), np.asarray(success))


@pytest.mark.slow
def test_layered_schedule_converges_faster(wifi):
    """Serial-C schedule: fewer sweeps than flooding on average, BER no
    worse (MC tolerance), and the epsilon probe still decodes exactly."""
    noisy, _, _ = transmit_zero_codeword(jax.random.key(21), 8, wifi.n, 2.6)
    flood = make_static_sweep_decoder(wifi, max_iters=30, tile_b=4,
                                      store_dtype=jnp.float32,
                                      interpret=True)
    layer = make_static_sweep_decoder(wifi, max_iters=30, tile_b=4,
                                      store_dtype=jnp.float32,
                                      schedule="layered", interpret=True)
    ef, itf, okf = [np.asarray(v) for v in flood(noisy)]
    el, itl, okl = [np.asarray(v) for v in layer(noisy)]
    assert okl.sum() >= okf.sum()
    both = okf & okl
    assert both.any()
    assert itl[both].mean() < itf[both].mean()
    assert el.sum() <= ef.sum() + 8

    probe = jnp.tile(epsilon_probe(wifi.n, flips=(3,)), (4, 1))
    e, it, ok = [np.asarray(v) for v in layer(probe)]
    assert ok.all() and e.sum() == 0


def _assert_popcount_bit_identical(wifi, combos):
    """The sign-popcount micro-opt (ROADMAP parked item): deriving the
    per-check sign product from the packed edge-sign bits must leave
    trajectories bit-identical to the stored-plane kernel."""
    noisy, _, _ = transmit_zero_codeword(jax.random.key(9), 4, wifi.n, 2.2)
    for schedule, sd in combos:
        base = make_static_sweep_decoder(
            wifi, max_iters=10, tile_b=4, store_dtype=sd,
            schedule=schedule, interpret=True, popcount_sign=False)
        pop = make_static_sweep_decoder(
            wifi, max_iters=10, tile_b=4, store_dtype=sd,
            schedule=schedule, interpret=True, popcount_sign=True)
        eb, ib, ob = map(np.asarray, base(noisy))
        ep, ip, op = map(np.asarray, pop(noisy))
        assert np.array_equal(eb, ep), (schedule, sd)
        assert np.array_equal(ib, ip), (schedule, sd)
        assert np.array_equal(ob, op), (schedule, sd)


def test_popcount_sign_mode_bit_identical(wifi):
    # fast gate: the production-default combo (flooding, bfloat16)
    _assert_popcount_bit_identical(wifi, [("flooding", jnp.bfloat16)])


@pytest.mark.slow
def test_popcount_sign_mode_bit_identical_all_combos(wifi):
    # the remaining schedule x storage matrix
    _assert_popcount_bit_identical(
        wifi, [("flooding", jnp.int8), ("layered", jnp.bfloat16),
               ("layered", jnp.int8)])


def test_static_kernel_random_qc_codes():
    """Generality: random QC structures (mixed block weights including
    zero blocks, odd z values forcing the mod-z fixup) match the XLA
    decoder exactly in f32."""
    from ldpc_tpu.codes.qc import QCCode

    rng = np.random.default_rng(7)
    for trial, (z, mb, nb) in enumerate([(21, 2, 6), (13, 3, 7)]):
        shifts = []
        for r in range(mb):
            row = []
            for c in range(nb):
                w = int(rng.integers(0, 3))  # weight 0-2 blocks
                row.append(tuple(sorted(
                    rng.choice(z, size=w, replace=False).tolist())))
            # ensure no empty rows
            if all(len(b) == 0 for b in row):
                row[0] = (int(rng.integers(z)),)
            shifts.append(tuple(row))
        code = QCCode(z=z, shifts=tuple(shifts), name=f"rand{trial}")
        noisy, _, _ = transmit_zero_codeword(jax.random.key(trial), 4,
                                             code.n, 2.0)
        ref = decode(code, noisy, max_iters=8)
        dec = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                        store_dtype=jnp.float32,
                                        interpret=True)
        e, it, ok = dec(noisy)
        assert np.array_equal(np.asarray(ref.hard).sum(axis=1),
                              np.asarray(e))
        assert np.array_equal(np.asarray(ref.iterations), np.asarray(it))
        assert np.array_equal(np.asarray(ref.success), np.asarray(ok))


def test_static_kernel_high_degree_checks():
    """Check degree > 32 (high-rate codes): the packed edge-sign state
    spills into a second int32 word per check; trajectories still match
    the XLA decoder exactly, with and without the popcount-sign fold."""
    from ldpc_tpu.codes.qc import QCCode

    rng = np.random.default_rng(11)
    z, mb, nb = 9, 1, 20
    # 2-3 shifts per block -> check degree ~40-50 (> 32, < 64)
    shifts = [tuple(
        tuple(sorted(rng.choice(z, size=int(rng.integers(2, 4)),
                                replace=False).tolist()))
        for _ in range(nb))]
    code = QCCode(z=z, shifts=tuple(shifts), name="highdeg")
    from ldpc_tpu.ops.plan import DecodePlan
    assert DecodePlan.from_code(code).dmax_cn > 32
    noisy, _, _ = transmit_zero_codeword(jax.random.key(2), 4, code.n, 3.0)
    ref = decode(code, noisy, max_iters=8)
    for pc in (False, True):
        dec = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                        store_dtype=jnp.float32,
                                        interpret=True, popcount_sign=pc)
        e, it, ok = dec(noisy)
        assert np.array_equal(np.asarray(ref.hard).sum(axis=1),
                              np.asarray(e)), pc
        assert np.array_equal(np.asarray(ref.iterations),
                              np.asarray(it)), pc
        assert np.array_equal(np.asarray(ref.success), np.asarray(ok)), pc


@pytest.mark.parametrize("kind", ["normalized-min-sum", "offset-min-sum"])
@pytest.mark.slow
def test_static_kernel_minsum_variants_match_xla(wifi, kind):
    """Normalized/offset min-sum reconstruction matches the XLA decoder's
    materialised-message variants exactly (f32, short horizon)."""
    noisy, _, _ = transmit_zero_codeword(jax.random.key(4), 8, wifi.n, 2.0)
    ref = decode(wifi, noisy, max_iters=10, kind=kind)
    dec = make_static_sweep_decoder(wifi, max_iters=10, tile_b=4,
                                    store_dtype=jnp.float32, kind=kind,
                                    interpret=True)
    e, it, ok = dec(noisy)
    assert np.array_equal(np.asarray(ref.hard).sum(axis=1), np.asarray(e))
    assert np.array_equal(np.asarray(ref.iterations), np.asarray(it))
    assert np.array_equal(np.asarray(ref.success), np.asarray(ok))


@pytest.mark.parametrize("gate", ["barrier", "mul0"])
@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_dep_stride_gating_is_bit_identical(schedule, gate, monkeypatch):
    """dep_stride (rotation-hoist denial) is a pure scheduling lever:
    outputs must be bit-identical to the ungated kernel for every
    schedule and for both gate implementations — optimization_barrier
    and the mul-0 data-edge fallback used where Mosaic does not lower
    the barrier (pallas_static._barrier_lowers) — including failed
    words.  (A small random QC code keeps this in the fast suite;
    gating is structural, not z-dependent — wifi/near-earth take the
    same code path.)"""
    from ldpc_tpu.codes.qc import QCCode

    monkeypatch.setenv("LDPC_TPU_PALLAS_GATE",
                       {"barrier": "auto", "mul0": "mul0"}[gate])
    code = QCCode(z=19, name="dsrand", shifts=(
        ((3,), (7, 11), (0,), (), (5,), (2,)),
        ((1,), (), (4, 9), (8,), (), (6,))))
    noisy, _, _ = transmit_zero_codeword(jax.random.key(7), 8, code.n, 1.2)
    base = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                     store_dtype=jnp.float32,
                                     schedule=schedule, interpret=True,
                                     dep_stride=0)
    gated = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                      store_dtype=jnp.float32,
                                      schedule=schedule, interpret=True,
                                      dep_stride=2)
    for a, b in zip(base(noisy), gated(noisy)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sum_product_kernel_matches_xla_small():
    """Sum-product Pallas kernel vs the XLA sum-product decoder on small
    random QC codes: converged words must agree on (errors, success) and
    iteration counts may differ only where f32 accumulation-order noise
    flips a near-threshold word (none expected at this size)."""
    from ldpc_tpu.codes.qc import QCCode
    from ldpc_tpu.sim.channel import llr_from_channel

    rng = np.random.default_rng(11)
    for trial, (z, mb, nb) in enumerate([(21, 2, 6), (13, 3, 7)]):
        shifts = []
        for r in range(mb):
            row = []
            for c in range(nb):
                w = int(rng.integers(0, 3))
                row.append(tuple(sorted(
                    rng.choice(z, size=w, replace=False).tolist())))
            if all(len(b) == 0 for b in row):
                row[0] = (int(rng.integers(z)),)
            shifts.append(tuple(row))
        code = QCCode(z=z, shifts=tuple(shifts), name=f"sprand{trial}")
        noisy, sigma, _ = transmit_zero_codeword(jax.random.key(trial), 4,
                                                 code.n, 2.0)
        llr = llr_from_channel(noisy, sigma)
        ref = decode(code, llr, max_iters=8, kind="sum-product")
        dec = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                        store_dtype=jnp.float32,
                                        kind="sum-product", interpret=True)
        e, it, ok = dec(llr)
        ref_err = np.asarray(ref.hard).sum(axis=1)
        conv = np.asarray(ok) & np.asarray(ref.success)
        assert np.array_equal(np.asarray(e)[conv], ref_err[conv])
        assert np.array_equal(np.asarray(ok), np.asarray(ref.success))
        assert np.array_equal(np.asarray(it), np.asarray(ref.iterations))


@pytest.mark.slow
def test_sum_product_kernel_wifi_statistical(wifi):
    """Sum-product kernel on 802.11n with f32 storage: BER close to the
    XLA sum-product decoder at the same SNR (accumulation order differs,
    so the contract is statistical, like bf16 min-sum)."""
    from ldpc_tpu.sim.channel import llr_from_channel

    noisy, sigma, _ = transmit_zero_codeword(jax.random.key(5), 8,
                                             wifi.n, 2.2)
    llr = llr_from_channel(noisy, sigma)
    ref = decode(wifi, llr, max_iters=10, kind="sum-product")
    dec = make_static_sweep_decoder(wifi, max_iters=10, tile_b=4,
                                    store_dtype=jnp.float32,
                                    kind="sum-product", interpret=True)
    e, it, ok = dec(llr)
    ref_err = np.asarray(ref.hard).sum(axis=1)
    conv = np.asarray(ok) & np.asarray(ref.success)
    assert np.array_equal(np.asarray(e)[conv], ref_err[conv])
    assert abs(float(np.asarray(e).sum()) - float(ref_err.sum())) \
        <= 0.02 * wifi.n * 8 + 16


def test_int8_message_memory_small():
    """int8 fixed-point message memory (Q4.3 quantize-on-store): decodes
    correctly on small random QC codes — high-SNR batches reach the same
    zero-error decisions as f32, and a mid-SNR batch stays statistically
    close (quantization is a real decoder variant, not bit-exact)."""
    from ldpc_tpu.codes.qc import QCCode

    rng = np.random.default_rng(23)
    shifts = []
    z, mb, nb = (17, 2, 6)
    for r in range(mb):
        row = []
        for c in range(nb):
            w = int(rng.integers(1, 3))
            row.append(tuple(sorted(
                rng.choice(z, size=w, replace=False).tolist())))
        shifts.append(tuple(row))
    code = QCCode(z=z, shifts=tuple(shifts), name="q8rand")

    # high SNR: all words decode to zero errors in both dtypes
    noisy, _, _ = transmit_zero_codeword(jax.random.key(1), 4, code.n, 7.0)
    d8 = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                   store_dtype=jnp.int8, interpret=True)
    e8, it8, ok8 = d8(noisy)
    assert np.asarray(ok8).all() and np.asarray(e8).sum() == 0

    # mid SNR: BER within a loose statistical band of f32
    noisy, _, _ = transmit_zero_codeword(jax.random.key(2), 8, code.n, 2.0)
    df = make_static_sweep_decoder(code, max_iters=8, tile_b=4,
                                   store_dtype=jnp.float32, interpret=True)
    ef, _, okf = df(noisy)
    e8, _, ok8 = d8(noisy)
    assert abs(int(np.asarray(e8).sum()) - int(np.asarray(ef).sum())) \
        <= 0.05 * code.n * 8 + 8


def test_tile_b_regrouping_is_bit_identical():
    """tile_b (the kernel's codeword/lane tile) only regroups lanes;
    words are lane-independent, so any tile size must produce identical
    (errors, iterations, success) — the contract the on-chip tile_b
    scheduling A/B (scripts/sched_ab.py --tile-bs) relies on.  Low SNR
    so some words fail (exercises post-convergence latching too)."""
    from ldpc_tpu.codes.qc import QCCode

    rng = np.random.default_rng(3)
    shifts = tuple(
        tuple((int(rng.integers(11)),) for _ in range(6)) for _ in range(2))
    code = QCCode(z=11, shifts=shifts, name="tiletest")
    noisy, _, _ = transmit_zero_codeword(jax.random.key(5), 16, code.n, 0.5)
    outs = [
        np.asarray(jax.device_get(
            make_static_sweep_decoder(code, max_iters=6, tile_b=tb,
                                      store_dtype=jnp.float32,
                                      interpret=True)(noisy)))
        for tb in (4, 8, 16)
    ]
    assert (~outs[0][2].astype(bool)).sum() > 0  # some words failed
    for other in outs[1:]:
        assert np.array_equal(outs[0], other)


def test_staged_device_tile_b_plumbing():
    """make_staged_decoder_device(tile_b=...) reaches the Pallas engine
    and leaves results identical (caps round to the tile)."""
    from ldpc_tpu.codes.qc import QCCode
    from ldpc_tpu.sim.evaluate import make_staged_decoder_device

    rng = np.random.default_rng(0)
    shifts = tuple(
        tuple((int(rng.integers(7)),) for _ in range(6)) for _ in range(2))
    code = QCCode(z=7, shifts=shifts, name="tilestage")
    noisy, _, _ = transmit_zero_codeword(jax.random.key(2), 16, code.n, 1.0)
    r1 = jax.device_get(make_staged_decoder_device(
        code, 8, phase1_iters=3, engine="pallas")(noisy))
    r2 = jax.device_get(make_staged_decoder_device(
        code, 8, phase1_iters=3, engine="pallas", tile_b=8)(noisy))
    for a, b in zip(r1, r2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("store_dtype", [
    pytest.param(jnp.float32, marks=pytest.mark.slow),  # keep suite fast
    jnp.bfloat16,
])
def test_split_decoder_word_exact_vs_monolithic(store_dtype):
    """The phase-split decoder (ops/pallas_split.py: row/col passes as
    separate pallas_calls, state in HBM, XLA-level while_loop) must be
    word-exact to the monolithic flooding kernel — errors, iteration
    counts, and success flags — including non-converged words (wifi at
    2.0 dB / 8 iters leaves a large failed set)."""
    from ldpc_tpu.ops.pallas_split import make_split_sweep_decoder

    code = wifi_code()
    noisy, _, _ = transmit_zero_codeword(jax.random.key(7), 256,
                                         code.n, 2.0)
    mono = make_static_sweep_decoder(code, max_iters=8, tile_b=128,
                                     store_dtype=store_dtype,
                                     interpret=True)
    split = make_split_sweep_decoder(code, max_iters=8, tile_b=128,
                                     store_dtype=store_dtype,
                                     interpret=True)
    a = jax.device_get(mono(noisy))
    b = jax.device_get(split(noisy))
    assert int((~np.asarray(a[2]).astype(bool)).sum()) > 0  # failed words
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_nonfinite_llr_sanitized(wifi):
    """+-inf / NaN channel LLRs are sanitized at kernel entry (advisor
    r3): the corrupted word decodes to FINITE outputs and every other
    word's trajectory is bit-identical to the clean-batch decode (lanes
    are independent)."""
    noisy, _, _ = transmit_zero_codeword(jax.random.key(11), 4, wifi.n, 3.0)
    dec = make_static_sweep_decoder(wifi, max_iters=8, tile_b=4,
                                    store_dtype=jnp.float32,
                                    interpret=True)
    clean = [np.asarray(x) for x in dec(noisy)]
    bad = np.asarray(noisy).copy()
    bad[0, 0] = np.inf
    bad[0, 1] = -np.inf
    bad[0, 2] = np.nan
    got = [np.asarray(x) for x in dec(jnp.asarray(bad))]
    for g in got:
        assert np.all(np.isfinite(g))
    for c, g in zip(clean, got):
        assert np.array_equal(c[1:], g[1:])  # untouched words unchanged
