"""Multi-device tests on the virtual 8-device CPU mesh.

The reference cannot test its multi-GPU paths without GPUs (SURVEY.md §4);
here the sharded sweep actually runs on 8 virtual devices and must agree
with the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ldpc_tpu.codes import wifi_code
from ldpc_tpu.parallel import (DATA_AXIS, evaluate_code_sharded, make_mesh,
                               process_batch_slice, sharded_sweep_step)
from ldpc_tpu.sim import evaluate_code


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8


def test_sharded_step_matches_single_device():
    wifi = wifi_code()
    mesh = make_mesh()
    step = sharded_sweep_step(wifi, mesh, max_iters=20)
    key = jax.random.key(4)
    snr = jax.device_put(jnp.full((16,), 3.5, jnp.float32),
                         NamedSharding(mesh, P(DATA_AXIS)))
    out = jax.device_get(step(key, snr))
    assert out["frames"] == 16
    # identical computation on one device (replicated input, same key)
    from ldpc_tpu.sim import sweep_step
    single = sweep_step(wifi, max_iters=20)
    ref = jax.device_get(single(key, jnp.full((16,), 3.5, jnp.float32)))
    assert out["errors_decoded"] == int(ref["errors_decoded"].sum())
    assert out["iterations_sum"] == int(ref["iterations"].sum())
    assert out["success_count"] == int(ref["success"].sum())


def test_evaluate_code_sharded_waterfall():
    wifi = wifi_code()
    mesh = make_mesh()
    stats = evaluate_code_sharded(wifi, [2.0, 4.0], 32, max_iters=20,
                                  mesh=mesh, batch_size=16, seed=11)
    (_, _, _, axis, avg_snr, ber, avg_itr) = stats.get_stats_v2()
    assert len(stats) == 64
    assert ber[1] == 0.0 and ber[0] > 0
    np.testing.assert_allclose(avg_snr, axis, atol=0.3)


def test_sharded_staged_equals_single_device_staged():
    """VERDICT r2 #4: the staged cascade inside the shard_map'd step must
    reproduce the single-device staged statistics EXACTLY — same keys and
    batching give identical channel draws (partitionable threefry), and
    per-word convergence latching makes the per-shard cascades equivalent
    to the global one."""
    wifi = wifi_code()
    kw = dict(max_iters=20, batch_size=32, seed=21, staged=True,
              phase1_iters=6)
    a = evaluate_code_sharded(wifi, [2.5, 3.5], 64, mesh=make_mesh(), **kw)
    b = evaluate_code(wifi, [2.5, 3.5], 64, **kw)
    sa, sb = a.summary(), b.summary()
    assert sa["transmissions"] == sb["transmissions"] == 128
    np.testing.assert_array_equal(sa["ber"], sb["ber"])
    np.testing.assert_array_equal(sa["fer"], sb["fer"])
    np.testing.assert_allclose(sa["avg_iterations"], sb["avg_iterations"],
                               rtol=1e-6)


def test_sharded_staged_equals_sharded_unstaged():
    """Staging is a pure optimization: per-word latching makes the cascade
    bit-equivalent to the straight max_iters decode."""
    wifi = wifi_code()
    mesh = make_mesh()
    a = evaluate_code_sharded(wifi, [3.0], 32, max_iters=16, mesh=mesh,
                              batch_size=32, seed=5, staged=True,
                              phase1_iters=4)
    b = evaluate_code_sharded(wifi, [3.0], 32, max_iters=16, mesh=mesh,
                              batch_size=32, seed=5)
    sa, sb = a.summary(), b.summary()
    np.testing.assert_array_equal(sa["ber"], sb["ber"])
    np.testing.assert_allclose(sa["avg_iterations"], sb["avg_iterations"],
                               rtol=1e-6)


def test_sharded_layered_needs_pallas():
    wifi = wifi_code()
    with pytest.raises(ValueError, match="pallas"):
        evaluate_code_sharded(wifi, [3.0], 8, max_iters=10, staged=False,
                              mesh=make_mesh(), engine="xla",
                              schedule="layered")


@pytest.mark.slow
def test_sharded_layered_schedule_matches_single_device():
    """``schedule`` is plumbed through the sharded path: the layered
    pallas cascade over the mesh reproduces the single-device layered
    statistics exactly (same keys + batching, per-word latching)."""
    wifi = wifi_code()
    kw = dict(max_iters=12, batch_size=16, seed=3, staged=True,
              phase1_iters=4, engine="pallas", schedule="layered")
    a = evaluate_code_sharded(wifi, [3.0], 32, mesh=make_mesh(),
                              pallas_tile_b=2, **kw)
    b = evaluate_code(wifi, [3.0], 32, **kw)
    sa, sb = a.summary(), b.summary()
    np.testing.assert_array_equal(sa["ber"], sb["ber"])
    np.testing.assert_allclose(sa["avg_iterations"], sb["avg_iterations"],
                               rtol=1e-6)


def test_sharded_checkpoint_resume_and_early_abort(tmp_path):
    wifi = wifi_code()
    mesh = make_mesh()
    ckpt = str(tmp_path / "sweep.npz")
    kw = dict(max_iters=12, mesh=mesh, batch_size=16, seed=9, staged=True,
              phase1_iters=4)
    a = evaluate_code_sharded(wifi, [2.0, 4.0], 32, checkpoint_path=ckpt,
                              **kw)
    # resume: both points complete -> second call adds nothing
    b = evaluate_code_sharded(wifi, [2.0, 4.0], 32, checkpoint_path=ckpt,
                              **kw)
    assert b.summary()["transmissions"] == a.summary()["transmissions"]
    # early abort: 2.0 dB is below the waterfall, so BER >> 1e-6 stops
    # the sweep before 4.0 dB
    c = evaluate_code_sharded(wifi, [2.0, 4.0], 32, early_abort_ber=1e-6,
                              **kw)
    assert list(np.unique(c.column("snr"))) == [2.0]


def test_process_batch_slice_single_process():
    start, size = process_batch_slice(100)
    assert (start, size) == (0, 100)


def test_sharded_and_unsharded_sweeps_agree_statistically():
    wifi = wifi_code()
    a = evaluate_code_sharded(wifi, [3.5], 64, max_iters=20,
                              mesh=make_mesh(), batch_size=32, seed=21)
    b = evaluate_code(wifi, [3.5], 64, max_iters=20, batch_size=32, seed=21)
    sa, sb = a.summary(), b.summary()
    assert sa["transmissions"] == sb["transmissions"] == 64
    # same seeds but different batch packing: statistically close only
    assert abs(sa["avg_iterations"][0] - sb["avg_iterations"][0]) < 3.0


@pytest.mark.slow
def test_sharded_pallas_engine_matches_xla():
    """The pallas engine (shard_map over the mesh, interpret mode on CPU)
    produces the same aggregate statistics as the XLA engine for the same
    seed and batching."""
    wifi = wifi_code()
    mesh = make_mesh()
    kw = dict(max_iters=12, mesh=mesh, batch_size=32, seed=13,
              pallas_tile_b=4)
    a = evaluate_code_sharded(wifi, [2.8], 32, engine="pallas", **kw)
    b = evaluate_code_sharded(wifi, [2.8], 32, engine="xla", **kw)
    sa, sb = a.summary(), b.summary()
    assert sa["transmissions"] == sb["transmissions"]
    # identical channel draws + min-sum: BER equal up to rare marginal
    # words (f32 ordering); success counts within a couple of frames
    assert abs(sa["ber"][0] - sb["ber"][0]) < 2e-3
    assert abs(sa["fer"][0] - sb["fer"][0]) <= 2 / 32


def test_row_sharded_decoder_exact_integer_llrs():
    """Check-block-axis sharding (parallel/rowshard.py): with
    integer-valued LLRs every f32 partial sum is exact, so the sharded
    decoder must match ops/decoder.py bit-for-bit on (errors, iterations,
    success) — including non-converged words."""
    from jax.sharding import Mesh

    from ldpc_tpu.ops.decoder import decode
    from ldpc_tpu.parallel.rowshard import make_row_sharded_decoder

    wifi = wifi_code(rate=0.5)  # 12 block rows
    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("row",))
    dec = make_row_sharded_decoder(wifi, mesh, max_iters=12)
    # quantized channel: llr in {-5..5}\{0}
    rng = np.random.default_rng(11)
    llr = rng.integers(-5, 6, size=(8, wifi.n)).astype(np.float32)
    llr[llr == 0] = -1.0
    errors, iters, ok = map(np.asarray, jax.device_get(dec(jnp.asarray(llr))))
    ref = decode(wifi, jnp.asarray(llr), max_iters=12)
    assert np.array_equal(np.asarray(ref.hard).sum(axis=1), errors)
    assert np.array_equal(np.asarray(ref.iterations), iters)
    assert np.array_equal(np.asarray(ref.success), ok)


def test_synthetic_qc_code_and_giant_rowshard():
    """Giant-code path (VERDICT r2 #7): a synthetic regular QC code with a
    multi-thousand z decodes bit-exactly through the row-sharded engine
    (integer LLRs make f32 partial sums exact)."""
    from jax.sharding import Mesh

    from ldpc_tpu.codes import synthetic_qc_code
    from ldpc_tpu.ops.decoder import decode
    from ldpc_tpu.parallel.rowshard import make_row_sharded_decoder

    code = synthetic_qc_code(2048, 8, 24, seed=1)
    assert code.n == 24 * 2048 and set(code.col_degrees()) == {3}
    assert code == synthetic_qc_code(2048, 8, 24, seed=1)  # deterministic
    mesh = Mesh(np.asarray(jax.devices()), ("row",))
    dec = make_row_sharded_decoder(code, mesh, max_iters=6)
    rng = np.random.default_rng(2)
    llr = rng.integers(-5, 6, size=(2, code.n)).astype(np.float32)
    llr[llr == 0] = -1.0
    errors, iters, ok = map(np.asarray, jax.device_get(dec(jnp.asarray(llr))))
    ref = decode(code, jnp.asarray(llr), max_iters=6)
    assert np.array_equal(np.asarray(ref.hard).sum(axis=1), errors)
    assert np.array_equal(np.asarray(ref.iterations), iters)
    assert np.array_equal(np.asarray(ref.success), ok)


def test_row_sharded_decoder_2d_mesh_awgn():
    """(data x row) 2-D mesh: batch sharded over data, check rows over
    row.  AWGN floats: converged words agree exactly with the unsharded
    decoder (syndrome-latched trajectories), batch BER statistically
    close."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ldpc_tpu.ops.decoder import decode
    from ldpc_tpu.parallel.rowshard import make_row_sharded_decoder
    from ldpc_tpu.sim.channel import transmit_zero_codeword

    wifi = wifi_code(rate=0.5)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "row"))
    dec = make_row_sharded_decoder(wifi, mesh, max_iters=10,
                                   data_axis="data")
    noisy, _, _ = transmit_zero_codeword(jax.random.key(3), 8, wifi.n, 2.0)
    noisy = jax.device_put(noisy, NamedSharding(mesh, P("data", None)))
    errors, iters, ok = map(np.asarray, jax.device_get(dec(noisy)))
    ref = decode(wifi, noisy, max_iters=10)
    conv = np.asarray(ref.success) & ok
    assert conv.any()
    assert np.array_equal(np.asarray(ref.hard).sum(axis=1)[conv],
                          errors[conv])
    assert np.array_equal(np.asarray(ref.iterations)[conv], iters[conv])
    assert abs(int(errors.sum()) -
               int(np.asarray(ref.hard).sum())) <= 0.02 * wifi.n * 8 + 16
