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
    from ldpc_tpu.sim.evaluate import sweep_step

    code = near_earth_code()
    max_iters = 50
    batch = int(jax.device_count() * 4096)
    snr_points = [3.0, 3.2, 3.4, 3.6]
    baseline_at_3p4 = 42335.2  # RTX 3080, common.py:34

    step = sweep_step(code, max_iters=max_iters)
    key = jax.random.key(7134066)

    # compile once (shape is shared across SNR points)
    warm = jax.block_until_ready(
        step(key, jnp.full((batch,), 3.4, jnp.float32)))
    del warm

    detail = {}
    for snr in snr_points:
        snr_arr = jnp.full((batch,), snr, jnp.float32)
        trials = 3
        t0 = time.time()
        errs = it_sum = succ = 0
        for t in range(trials):
            out = jax.block_until_ready(
                step(jax.random.fold_in(key, int(snr * 10) + t), snr_arr))
        dt = (time.time() - t0) / trials
        out = jax.device_get(out)
        bits = batch * code.n
        detail[snr] = {
            "bit_per_s": bits / dt,
            "ber": float(out["errors_decoded"].sum()) / bits,
            "success_rate": float(out["success"].mean()),
            "avg_iterations": float(out["iterations"].mean()),
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
