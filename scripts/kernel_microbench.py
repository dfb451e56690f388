"""Speed-of-light analysis of the Pallas check-node kernel (VERDICT #1).

The reference recorded per-kernel microseconds as comments next to its CUDA
block configs (ldpcCUDA.py:78-90); this script is the TPU equivalent with
more rigor: in-kernel slope measurements that cancel dispatch overhead.

Every probe builds a tiny Pallas kernel whose body runs K times inside one
``fori_loop``, and the per-op cost is the wall-clock slope between two K
values — the ~33 ms tunnel round trip and compile/launch overheads subtract
out.  Bodies must be FOLD-RESISTANT: a pure ``x+c`` or repeated static roll
measures ~0 because the compiler composes/eliminates it across iterations
(measured), so every body carries a non-affine op (abs) in its dependency
chain and the abs+add baseline is subtracted where needed.

The real decoder's per-iteration cost is measured the same way (max_iters
slope on non-converging 0 dB input) and compared against the op-count model
built from the measured primitives.

Run ON THE REAL CHIP (no JAX_PLATFORMS override):
    python scripts/kernel_microbench.py [--quick]
Writes docs/kernel_roofline.json and prints a markdown-ready table.
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("LDPC_TPU_PLATFORM"):
    # sitecustomize registers the tunnelled backend before JAX_PLATFORMS
    # is honoured; the config route still works (see ldpc_tpu/cli.py)
    jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])
import jax.numpy as jnp
import numpy as np

Z, ZP, TB = 511, 512, 128


def _build_probe(body, n_iters: int, n_bufs: int, dtype, rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, out_ref):
        def loop(it, _):
            bufs = [x_ref[i] for i in range(n_bufs)]
            outs = body(bufs, it)
            for i, o in enumerate(outs):
                x_ref[i] = o
            return 0

        jax.lax.fori_loop(0, n_iters, loop, 0, unroll=False)
        out_ref[0, 0] = jnp.sum(x_ref[0].astype(jnp.float32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(x)

    return run


def _time(run, x, trials: int = 5) -> float:
    """Best wall-clock over trials with distinct inputs (identical
    (executable, input) pairs are served from the backend cache)."""
    best = float("inf")
    for t in range(trials):
        xt = (x + jnp.asarray(t, x.dtype)).astype(x.dtype)
        jax.device_get(run(xt))  # warm (compile on first trial)
        t0 = time.time()
        jax.device_get(run(xt))
        best = min(best, time.time() - t0)
    return best


def slope_ns(body, k1: int, k2: int, n_bufs: int = 1,
             dtype=jnp.float32, rows: int = ZP) -> float:
    """Per-body-execution cost in nanoseconds."""
    shape = (n_bufs, rows, TB)
    x = (jnp.arange(np.prod(shape), dtype=jnp.float32)
         .reshape(shape) % 7 - 3).astype(dtype)
    t1 = _time(_build_probe(body, k1, n_bufs, dtype, rows), x)
    t2 = _time(_build_probe(body, k2, n_bufs, dtype, rows), x)
    return (t2 - t1) / (k2 - k1) * 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-decoder", action="store_true")
    ap.add_argument("--skip-primitives", action="store_true")
    args = ap.parse_args()
    from jax.experimental.pallas import tpu as pltpu

    k1, k2 = (1000, 11000) if args.quick else (2000, 42000)
    f32 = jnp.float32
    results: dict = {"device": str(jax.devices()[0]),
                     "tile": [ZP, TB], "k": [k1, k2]}

    if not args.skip_primitives:
        # --- primitives; all bodies carry abs in the chain -------------
        def p_base(bufs, it):            # abs + add: the baseline pair
            return [jnp.abs(bufs[0]) + f32(0.1)]

        def p_roll(bufs, it):            # baseline + 1 static roll
            return [pltpu.roll(jnp.abs(bufs[0]) + f32(0.1), 117, axis=0)]

        def p_mod_rot(bufs, it):         # baseline + exact mod-511 rot
            x = jnp.abs(bufs[0]) + f32(0.1)
            a = pltpu.roll(x, ZP - 117, axis=0)
            b = pltpu.roll(x, Z - 117, axis=0)
            i_row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            return [jnp.where(i_row < Z - 117, a, b)]

        def p_bf16(bufs, it):            # baseline + f32->bf16->f32
            y = jnp.abs(bufs[0].astype(f32)) + f32(0.1)
            return [y.astype(jnp.bfloat16)]

        def p_twomin_edge(bufs, it):     # phase-A per-edge fold (no rot)
            t, m1, m2 = bufs
            v = t - m1 * f32(0.5)
            a = jnp.abs(v)
            newmin = a < m1
            m2n = jnp.where(newmin, m1, jnp.minimum(m2, a))
            m1n = jnp.minimum(m1, a)
            return [jnp.where(v < 0, -t, t), m1n, m2n]

        def p_recon(bufs, it):           # phase-B recon (no rot)
            m1, m2, am = bufs
            sgn = jnp.where(m1 > f32(1.0), -f32(1.0), f32(1.0))
            mag = jnp.where(am == f32(3.0), m2, m1)
            out = sgn * mag
            return [jnp.abs(out) + f32(0.1), m2, am]

        probes = [
            ("abs_add_baseline", p_base, 1, f32, ZP),
            ("baseline+static_roll", p_roll, 1, f32, ZP),
            ("baseline+static_roll_1024", p_roll, 1, f32, 1024),
            ("baseline+mod511_rot", p_mod_rot, 1, f32, ZP),
            ("baseline+f32_to_bf16", p_bf16, 1, jnp.bfloat16, ZP),
            ("twomin_edge_no_rot", p_twomin_edge, 3, f32, ZP),
            ("recon_no_rot", p_recon, 3, f32, ZP),
        ]
        for name, body, nb, dt, rows in probes:
            ns = slope_ns(body, k1, k2, nb, dt, rows)
            results[name] = ns
            print(f"{name:28s} {ns:8.1f} ns/op", file=sys.stderr)

    # --- real decoder per-iteration slope ------------------------------
    if not args.skip_decoder:
        from ldpc_tpu.codes import near_earth_code
        from ldpc_tpu.ops.pallas_static import make_static_sweep_decoder
        from ldpc_tpu.sim.evaluate import _transmit_fn

        code = near_earth_code()
        transmit = _transmit_fn(code.n, False)
        key = jax.random.key(5)
        for store in ("bfloat16", "float32"):
            times = {}
            try:
                for mi in (10, 40):
                    dec = make_static_sweep_decoder(
                        code, mi, store_dtype=jnp.dtype(store))
                    best = float("inf")
                    for t in range(4):
                        # 0 dB: nothing converges; body never predicates
                        # off
                        llr, *_ = transmit(
                            jax.random.fold_in(key, 100 * mi + t),
                            jnp.full((TB,), 0.0, jnp.float32))
                        jax.device_get(dec(llr))
                        t0 = time.time()
                        jax.device_get(dec(llr))
                        best = min(best, time.time() - t0)
                    times[mi] = best
            except Exception as e:  # noqa: BLE001 — over-ceiling schedule
                print(f"decoder {store}: skipped "
                      f"({type(e).__name__}: {str(e)[:120]})",
                      file=sys.stderr)
                continue
            us = (times[40] - times[10]) / 30 * 1e6
            results[f"decoder_us_per_iter_{store}"] = us
            print(f"decoder {store} flooding: {us:.1f} us/iter/tile "
                  f"({us / TB * 1e3:.1f} ns/word-iter)", file=sys.stderr)

    print(json.dumps(results, indent=1))
    with open("/root/repo/docs/kernel_roofline.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
