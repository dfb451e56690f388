"""Giant-code demonstration: row-sharded decode of codes too large for a
single chip's VMEM-resident path (VERDICT r2 #7).

The reference's biggest code is near-earth (n = 8176; ~130 KB of message
state per word) — one chip holds it thousands of times over, so its only
parallel axis is transmissions (ldpcCUDA.py:891-932).  The row-sharded
decoder (parallel/rowshard.py) is the path for codes whose per-word edge
state outgrows one device.  This script builds synthetic protograph QC
codes with circulant sizes in the thousands-to-tens-of-thousands
(DVB-S2 is z~360 at n=64800; we go far beyond) and decodes them across
the mesh in pure-row and (data x row) layouts, recording per-device state
memory and decoded throughput, plus a bit-exactness cross-check against
the unsharded decoder where the code still fits one device.

CPU mesh (default, 8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  LDPC_TPU_PLATFORM=cpu python scripts/giant_code.py
Real chip (row axis = 1 device degenerates to unsharded; the interesting
on-chip run needs a real multi-chip slice):
  python scripts/giant_code.py --z-list 4096,16384 --layouts 1x1

Writes docs/giant_code.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def state_bytes_per_device(code, n_row: int, b_local: int,
                           d_cn: int) -> int:
    """f32 while-loop live set per device: local c2v slots + the three
    row-replicated [Nb, Z, B] frames (channel, totals, partial)."""
    s_l = (code.block_rows // n_row) * d_cn
    frames = 3 * code.block_cols
    return (s_l + frames) * code.z * b_local * 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--z-list", default="2048,8192,16384,32768")
    ap.add_argument("--block-rows", type=int, default=8)
    ap.add_argument("--block-cols", type=int, default=24)
    ap.add_argument("--layouts", default="1x8,2x4",
                    help="comma list of DATAxROW mesh layouts")
    ap.add_argument("--words-per-data", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--snr-db", type=float, default=4.0)
    ap.add_argument("--crosscheck-z", type=int, default=512,
                    help="size for the unsharded bit-exactness gate "
                         "(0 = skip)")
    ap.add_argument("--out", default="/root/repo/docs/giant_code.json")
    args = ap.parse_args()

    import jax
    if os.environ.get("LDPC_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ldpc_tpu.codes import synthetic_qc_code
    from ldpc_tpu.parallel.rowshard import make_row_sharded_decoder
    from ldpc_tpu.sim.channel import transmit_zero_codeword

    devices = np.asarray(jax.devices())
    results: dict = {"devices": len(devices),
                     "platform": devices.reshape(-1)[0].platform,
                     "block_rows": args.block_rows,
                     "block_cols": args.block_cols,
                     "max_iters": args.iters, "snr_db": args.snr_db,
                     "runs": []}

    # --- bit-exactness gate: integer LLRs, sharded == unsharded ---
    if args.crosscheck_z:
        from ldpc_tpu.ops.decoder import decode
        code = synthetic_qc_code(args.crosscheck_z, args.block_rows,
                                 args.block_cols, seed=3)
        n_row = min(len(devices), args.block_rows)
        mesh = Mesh(devices[:n_row], ("row",))
        dec = make_row_sharded_decoder(code, mesh, max_iters=args.iters)
        rng = np.random.default_rng(5)
        llr = rng.integers(-5, 6, size=(4, code.n)).astype(np.float32)
        llr[llr == 0] = -1.0
        e, it, ok = map(np.asarray, jax.device_get(dec(jnp.asarray(llr))))
        ref = decode(code, jnp.asarray(llr), max_iters=args.iters)
        exact = (np.array_equal(np.asarray(ref.hard).sum(axis=1), e)
                 and np.array_equal(np.asarray(ref.iterations), it)
                 and np.array_equal(np.asarray(ref.success), ok))
        results["crosscheck"] = {"z": args.crosscheck_z, "n": code.n,
                                 "row_devices": n_row, "exact": bool(exact)}
        print(f"[giant] crosscheck z={args.crosscheck_z}: "
              f"{'EXACT' if exact else 'MISMATCH'}", file=sys.stderr)
        assert exact, "row-sharded decode diverged from the unsharded oracle"

    for z in (int(v) for v in args.z_list.split(",")):
        code = synthetic_qc_code(z, args.block_rows, args.block_cols,
                                 seed=1)
        d_cn = max(code.row_degrees())
        for layout in args.layouts.split(","):
            nd, nr = (int(v) for v in layout.split("x"))
            if nd * nr > len(devices) or args.block_rows % nr:
                continue
            mesh = Mesh(devices[:nd * nr].reshape(nd, nr), ("data", "row"))
            b = args.words_per_data * nd
            dec = make_row_sharded_decoder(code, mesh,
                                           max_iters=args.iters,
                                           data_axis="data")
            noisy, _, _ = transmit_zero_codeword(
                jax.random.key(z), b, code.n, args.snr_db)
            noisy = jax.device_put(
                noisy, NamedSharding(mesh, P("data", None)))
            t0 = time.time()
            try:
                e, it, ok = map(np.asarray,
                                jax.device_get(dec(noisy)))
            except Exception as exc:  # noqa: BLE001 — OOM etc.
                results["runs"].append({
                    "z": z, "n": code.n, "layout": layout,
                    "error": f"{type(exc).__name__}: {exc}"[:200]})
                print(f"[giant] z={z} layout={layout}: FAILED "
                      f"({type(exc).__name__})", file=sys.stderr)
                continue
            wall = time.time() - t0
            mem = state_bytes_per_device(code, nr, args.words_per_data,
                                         d_cn)
            run = {
                "z": z, "n": code.n, "m": code.m, "layout": layout,
                "words": b, "wall_s": wall,
                "bit_per_s": b * code.n / wall,
                "state_mib_per_device": mem / 2 ** 20,
                "avg_iterations": float(it.mean()),
                "ber": float(e.sum()) / (b * code.n),
                "success_rate": float(ok.mean()),
            }
            results["runs"].append(run)
            print(f"[giant] z={z} (n={code.n:,}) layout={layout}: "
                  f"{run['bit_per_s']:,.0f} bit/s  "
                  f"{run['state_mib_per_device']:.1f} MiB/dev  "
                  f"BER {run['ber']:.2e}  iters {run['avg_iterations']:.1f}",
                  file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    rows = ["| z | n | layout | words | MiB/device | bit/s | BER | iters |",
            "|---|---|---|---|---|---|---|---|"]
    for r in results["runs"]:
        if "error" in r:
            rows.append(f"| {r['z']} | {r['n']:,} | {r['layout']} | — | — "
                        f"| FAILED: {r['error'][:40]} | — | — |")
        else:
            rows.append(
                f"| {r['z']} | {r['n']:,} | {r['layout']} | {r['words']} | "
                f"{r['state_mib_per_device']:.1f} | "
                f"{r['bit_per_s']:,.0f} | {r['ber']:.2e} | "
                f"{r['avg_iterations']:.1f} |")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
