"""Command-line entry points.

``python -m ldpc_tpu.cli <command>`` replaces the reference's pattern of
runnable modules (``python ldpc.py`` -> testNearEarth, ``python
ldpcCUDA.py`` -> GPU benchmark, ``python randomAgent.py``, ``python
testMatricesGeneratorScript.py``, ``python gettingStarted.py``):

  evaluate     BER/FER sweep of a code on the accelerator
  probe        deterministic epsilon/bit-flip probe (ldpcCUDA.py:677)
  random-agent random code-search baseline
  perturb      write the zeroed-circulant robustness suite
  train        PPO code search (openAIppo.py equivalent)
  getting-started  environment sanity check (gettingStarted.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Platform override BEFORE any backend use: some environments register an
# accelerator plugin at interpreter start (sitecustomize), so the usual
# JAX_PLATFORMS env var is too late by the time jax is imported — the
# config route still works.  LDPC_TPU_PLATFORM=cpu forces CPU (smokes,
# CI boxes whose accelerator tunnel is down).
if os.environ.get("LDPC_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])


def _get_code(name: str):
    from .codes import near_earth_code, wifi_code
    if name in ("near-earth", "nearearth", "ccsds"):
        return near_earth_code()
    if name in ("wifi", "802.11n"):
        return wifi_code()
    from .codes import load_code_json
    return load_code_json(name)


def cmd_evaluate(args):
    from .sim import evaluate_code
    code = _get_code(args.code)
    import jax.numpy as jnp
    # a phase budget must sit below the full iteration budget; drop the
    # ones that don't (the default "12" with e.g. --iterations 8 simply
    # means an unstaged decode)
    phases = [int(p) for p in str(args.phase_iters).split(",")
              if int(p) < args.iterations]
    common = dict(
        seed=args.seed, batch_size=args.batch_size, kind=args.kind,
        scale_llr=(args.kind == "sum-product"), engine=args.engine,
        staged=not args.no_staged and bool(phases),
        phase1_iters=phases,
        store_dtype=(jnp.dtype(args.store_dtype)
                     if args.store_dtype else None),
        schedule=args.schedule,
        checkpoint_path=args.checkpoint,
        early_abort_ber=args.early_abort_ber,
        sort_words=args.sort_words,
        verbose=True)
    if args.tile_b is not None and args.engine != "pallas":
        raise SystemExit("--tile-b is a pallas-engine scheduling lever; "
                         "combine it with --engine pallas")
    if getattr(args, "codewords", "zero") == "random":
        if args.sharded:
            raise SystemExit("--codewords random is the single-device "
                             "validation path (XLA engine, unstaged)")
        if (args.engine != "xla" or args.schedule != "flooding"
                or args.store_dtype or args.tile_b is not None):
            raise SystemExit(
                "--codewords random runs the XLA engine unstaged "
                "(flooding, f32) — drop --engine/--schedule/"
                "--store-dtype/--tile-b rather than having them "
                "silently ignored")
        common.update(codewords="random", staged=False, phase1_iters=12)
    if args.sharded:
        # the reference wrapper's numberOfCudaDevices path
        # (ldpcCUDA.py:891-932): split the batch over every visible
        # device, merge counters with psum.  Accepts the same staged /
        # dtype / resume knobs as the single-device path.
        from .parallel import evaluate_code_sharded
        if args.tile_b is not None:
            common["pallas_tile_b"] = args.tile_b
        stats = evaluate_code_sharded(
            code, args.snr, args.transmissions, args.iterations, **common)
    else:
        stats = evaluate_code(
            code, args.snr, args.transmissions, args.iterations,
            tile_b=args.tile_b, **common)
    print(json.dumps(stats.summary()))
    if args.plot:
        from .analysis import plot_snr_vs_ber
        (_, _, _, axis, _, ber, _) = stats.get_stats_v2()
        plot_snr_vs_ber(axis, ber, file_name=args.plot)
        print(f"wrote {args.plot}", file=sys.stderr)


def cmd_bench(args):
    """Benchmark presets mirroring the reference's in-module self-tests.

    ``near-earth`` reproduces ``ldpc.testNearEarth`` / ``ldpcCUDA.
    testNearEarth`` (ldpc.py:480-498, ldpcCUDA.py:832-846): roi
    [3.0, 3.2, 3.4, 3.6] dB, min-sum, 50 iterations, decoded bit/s and
    per-point BER.  ``wifi`` reproduces ``wifiCUDA.testWifi`` (seed
    460101, same roi, 50 iterations, status 'OK' iff the BER at the two
    highest SNR points is zero — wifiCUDA.py:660-682).
    """
    import time
    from .sim import evaluate_code
    preset = args.preset
    code = _get_code(preset)
    seed = 460101 if preset == "wifi" else args.seed
    t0 = time.time()
    stats = evaluate_code(
        code, args.snr, args.transmissions, args.iterations, seed=seed,
        batch_size=args.batch_size, staged=True, engine=args.engine,
        verbose=True)
    dt = time.time() - t0
    (_, _, _, axis, _, ber, _) = stats.get_stats_v2()
    status = "OK" if len(ber) >= 2 and ber[-1] == 0 and ber[-2] == 0 \
        else f"{preset} problem"
    print(json.dumps({
        "preset": preset,
        "throughput_bit_per_s": code.n * len(args.snr)
        * args.transmissions / dt,
        "seconds": dt,
        "ber": {float(s): float(b) for s, b in zip(axis, ber)},
        "status": status,
    }))


def cmd_probe(args):
    from .sim import evaluate_epsilon_probe
    code = _get_code(args.code)
    unc, dec, iters, ok = evaluate_epsilon_probe(
        code, epsilon=args.epsilon, flips=tuple(args.flips),
        max_iters=args.iterations)
    print(json.dumps({"errors_uncoded": unc, "errors_decoded": dec,
                      "iterations": iters, "success": ok}))


def cmd_random_agent(args):
    from .envs import LdpcCodeSearchEnv
    from .rl import run_random_agent
    env = LdpcCodeSearchEnv(code=_get_code(args.code),
                            num_transmissions=args.transmissions,
                            seed=args.seed)
    rewards, env = run_random_agent(env, num_steps=args.steps,
                                    seed=args.seed)
    print(json.dumps({"rewards": rewards}))


def cmd_perturb(args):
    from .codes import write_suite
    code = _get_code(args.code)
    names = write_suite(code, args.out)
    print(json.dumps({"written": len(names), "dir": args.out}))


def cmd_train(args):
    from .rl.train import main as train_main
    train_main(args.rest)


def cmd_post_mortem(args):
    """Re-evaluate the best codes of an experiment TSV and/or draw action
    heat maps (postProcessing.py:27-160 equivalents)."""
    from .analysis import action_heatmaps, post_mortem_best_codes
    if args.heatmaps:
        out = action_heatmaps(args.tsv, save_figures=True)
        print(json.dumps({k: v.shape for k, v in out.items()},
                         default=str))
    if args.best:
        results = post_mortem_best_codes(
            args.tsv, num_transmissions=args.transmissions)
        for code, stats in results:
            print(json.dumps(stats.summary()))


def cmd_reward_surface(args):
    from .analysis import reward_surface
    reward_surface(start_point=args.start, end_point=args.end,
                   save_path=args.out)
    print(f"wrote {args.out}", file=sys.stderr)


def cmd_getting_started(args):
    """Environment sanity walk-through (gettingStarted.py equivalent)."""
    import jax
    print(f"jax {jax.__version__}; devices: {jax.devices()}")
    from .codes import near_earth_code, wifi_code
    ne = near_earth_code()
    print(f"near-earth: ({ne.n}, {ne.k}), {ne.block_rows}x"
          f"{ne.block_cols} blocks of Z={ne.z}")
    from .sim import evaluate_epsilon_probe
    unc, dec, iters, ok = evaluate_epsilon_probe(wifi_code(), flips=(0,),
                                                 max_iters=10)
    status = "OK" if (ok and dec == 0) else "FAILED"
    print(f"decoder smoke test (1 flip on 802.11n): {status} "
          f"({iters} iterations)")
    try:
        from . import native
        print(f"native C++ engine: "
              f"{'available' if native.available() else 'unavailable'}")
    except Exception as e:
        print(f"native C++ engine: unavailable ({e})")
    print("ready — see README.md for the API tour")


def main(argv=None):
    p = argparse.ArgumentParser(prog="ldpc_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    e = sub.add_parser("evaluate", help="BER/FER sweep")
    e.add_argument("--code", default="near-earth")
    e.add_argument("--snr", type=float, nargs="+",
                   default=[3.0, 3.2, 3.4, 3.6])
    e.add_argument("--transmissions", type=int, default=50)
    e.add_argument("--iterations", type=int, default=50)
    e.add_argument("--seed", type=int, default=7134066)
    e.add_argument("--batch-size", type=int, default=1024)
    e.add_argument("--kind", default="min-sum")
    e.add_argument("--no-staged", action="store_true")
    e.add_argument("--engine", default="xla", choices=["xla", "pallas"])
    e.add_argument("--schedule", default="flooding",
                   choices=["flooding", "layered"],
                   help="pallas-engine message schedule: flooding "
                        "(reference semantics) or layered (serial-C "
                        "schedule, ~2x fewer sweeps; requires "
                        "--engine pallas)")
    e.add_argument("--tile-b", type=int, default=None,
                   help="pallas kernel codeword tile (lane axis; "
                        "scheduling lever, multiple of 128 on hardware)")
    e.add_argument("--store-dtype", default=None,
                   choices=["bfloat16", "float32", "int8"],
                   help="pallas engine VMEM state dtype (int8 = Q4.3 "
                        "fixed-point message memory)")
    e.add_argument("--sharded", action="store_true",
                   help="evaluate over every visible device (mesh + psum "
                        "counter merge; evaluateCodeCudaWrapper's "
                        "numberOfCudaDevices equivalent)")
    e.add_argument("--phase-iters", default="12",
                   help="staged-decode cascade budgets, e.g. '6,16' for "
                        "6 -> 16 -> full-iteration stages (exactly "
                        "equivalent results, less straggler waste)")
    e.add_argument("--checkpoint", default=None,
                   help="save statistics after every SNR point and resume "
                        "past completed points on restart")
    e.add_argument("--sort-words", action="store_true",
                   help="straggler-aware tiling: difficulty-sort the "
                        "batch before decoding (bit-identical outputs; "
                        "scheduling lever for the pallas tile early-exit)")
    e.add_argument("--codewords", default="zero",
                   choices=["zero", "random"],
                   help="'random' transmits encoded random messages and "
                        "counts errors vs the transmitted word (validates "
                        "the all-zero protocol; ldpc.py:409-416 done "
                        "right)")
    e.add_argument("--early-abort-ber", type=float, default=None,
                   help="stop the sweep once a point's BER exceeds this "
                        "reference value (ldpc.py:473-475)")
    e.add_argument("--plot", default=None)
    e.set_defaults(fn=cmd_evaluate)

    be = sub.add_parser("bench", help="reference benchmark presets")
    be.add_argument("preset", choices=["near-earth", "wifi"])
    be.add_argument("--snr", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6])
    be.add_argument("--transmissions", type=int, default=50)
    be.add_argument("--iterations", type=int, default=50)
    be.add_argument("--seed", type=int, default=7134066)
    be.add_argument("--batch-size", type=int, default=1024)
    be.add_argument("--engine", default="pallas",
                    choices=["xla", "pallas"])
    be.set_defaults(fn=cmd_bench)

    pr = sub.add_parser("probe", help="deterministic epsilon probe")
    pr.add_argument("--code", default="near-earth")
    pr.add_argument("--epsilon", type=float, default=1e-2)
    pr.add_argument("--flips", type=int, nargs="*", default=[0])
    pr.add_argument("--iterations", type=int, default=50)
    pr.set_defaults(fn=cmd_probe)

    ra = sub.add_parser("random-agent", help="random-search baseline")
    ra.add_argument("--code", default="near-earth")
    ra.add_argument("--steps", type=int, default=10)
    ra.add_argument("--transmissions", type=int, default=10)
    ra.add_argument("--seed", type=int, default=42)
    ra.set_defaults(fn=cmd_random_agent)

    pe = sub.add_parser("perturb", help="zeroed-circulant suite")
    pe.add_argument("--code", default="near-earth")
    pe.add_argument("--out", default="/tmp/ldpc_tpu_test_matrices")
    pe.set_defaults(fn=cmd_perturb)

    tr = sub.add_parser("train", help="PPO code search")
    tr.add_argument("rest", nargs="*", help="args passed to rl.train")
    tr.set_defaults(fn=cmd_train)

    gs = sub.add_parser("getting-started", help="environment sanity check")
    gs.set_defaults(fn=cmd_getting_started)

    pm = sub.add_parser("post-mortem", help="experiment post-hoc analysis")
    pm.add_argument("tsv", help="experiment TSV log")
    pm.add_argument("--best", action="store_true",
                    help="re-evaluate best codes")
    pm.add_argument("--heatmaps", action="store_true",
                    help="write action heat maps")
    pm.add_argument("--transmissions", type=int, default=64)
    pm.set_defaults(fn=cmd_post_mortem)

    rs = sub.add_parser("reward-surface", help="reward landscape plot")
    rs.add_argument("--start", type=float, default=2.8)
    rs.add_argument("--end", type=float, default=3.8)
    rs.add_argument("--out", default="rewardSurface.png")
    rs.set_defaults(fn=cmd_reward_surface)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
