"""Headline benchmark: near-earth decoded throughput on real TPU hardware.

Mirrors the reference's benchmark protocol (``ldpc.testNearEarth``,
ldpc.py:480-498 / ``ldpcCUDA.testNearEarth``, ldpcCUDA.py:832-846): CCSDS
near-earth (8176, 7154), min-sum, max 50 iterations, Eb/N0 sweep
[3.0, 3.2, 3.4, 3.6] dB, decoded codeword bits per second.  The baseline is
the reference's best published number at 3.4 dB — 42,335.2 bit/s on an RTX
3080 (common.py:34) — but we also weigh against the full-sweep aggregate.

Engine: the VMEM-resident unrolled Pallas kernel (ops/pallas_static.py) via
the single-dispatch device-staged decoder (one host round trip per batch —
through the tunnelled backend a round trip costs ~33 ms, more than the
decode).  Per-word semantics are identical to a straight 50-iteration
decode (convergence latching).  Falls back to the XLA while-loop engine
automatically if the kernel fails to build on the current toolchain.
Overrides: LDPC_TPU_BENCH_ENGINE=xla|pallas, LDPC_TPU_BENCH_DTYPE,
LDPC_TPU_BENCH_BATCH.

Tunnel resilience (round-2 postmortem: BENCH_r02 was lost to a down
tunnel): the measurement runs in a CHILD process supervised by this
script.  The supervisor probes the backend in a throwaway subprocess
(a failed in-process backend init is cached by JAX and unrecoverable),
retries the child on wedge/timeout, and on terminal failure emits the
one-line JSON with an explicit ``"error": "tpu-unavailable"`` instead of
a traceback.  ``LDPC_TPU_BENCH_CHILD=1`` runs the measurement directly.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bit/s", "vs_baseline": N}
plus detail lines on stderr.
"""

import json
import os
import subprocess
import sys
import time

METRIC = "near_earth_decoded_throughput_3p4dB_50iters"
BASELINE_AT_3P4 = 42335.2  # RTX 3080, reference common.py:34
SNR_POINTS = [3.0, 3.2, 3.4, 3.6]


def emit(value, vs_baseline, extra=None):
    line = {"metric": METRIC, "value": value, "unit": "bit/s",
            "vs_baseline": vs_baseline}
    if extra:
        line.update(extra)
    print(json.dumps(line))
    sys.stdout.flush()


# --------------------------------------------------------------------------
# Supervisor: probe / launch child / retry / emit terminal JSON
# --------------------------------------------------------------------------

def probe_backend(timeout_s=120):
    """True when a fresh subprocess can run one op on the default backend."""
    # sitecustomize registers the tunnelled backend before JAX_PLATFORMS is
    # honoured; the jax.config route still works (cf. cli.py:26-31), so the
    # probe respects LDPC_TPU_PLATFORM the same way the measurement does.
    code = ("import os, jax; "
            "p = os.environ.get('LDPC_TPU_PLATFORM'); "
            "p and jax.config.update('jax_platforms', p); "
            "import jax.numpy as jnp; "
            "jax.device_get(jnp.ones((8, 128)).sum())")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def wait_backend(probes=None, sleep_s=None):
    probes = probes or int(os.environ.get("LDPC_TPU_BENCH_PROBES", "3"))
    sleep_s = sleep_s if sleep_s is not None else int(
        os.environ.get("LDPC_TPU_BENCH_PROBE_SLEEP", "120"))
    for i in range(probes):
        t0 = time.time()
        if probe_backend():
            return True
        print(f"[bench] backend probe {i + 1}/{probes} failed "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
        if i + 1 < probes:
            time.sleep(sleep_s)
    return False


def supervise():
    attempts = int(os.environ.get("LDPC_TPU_BENCH_ATTEMPTS", "2"))
    child_timeout = int(os.environ.get("LDPC_TPU_BENCH_CHILD_TIMEOUT",
                                       "2100"))
    env = dict(os.environ, LDPC_TPU_BENCH_CHILD="1")
    # Persistent compile cache: the Pallas kernel compile costs 2-6 min,
    # so a retried child (or a rerun after a tunnel wedge) should reuse
    # the first attempt's executables instead of re-paying the riskiest
    # part of the run.  No-op if the backend can't serialize executables.
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache"))
    last_err = "tpu-unavailable"
    for attempt in range(1, attempts + 1):
        if not wait_backend():
            print(f"[bench] attempt {attempt}/{attempts}: backend never "
                  "answered the probe", file=sys.stderr)
            last_err = "tpu-unavailable"
            continue
        print(f"[bench] attempt {attempt}/{attempts}: backend up, "
              "launching measurement child", file=sys.stderr)
        try:
            # stderr inherits (detail lines stream through); stdout is
            # captured so the child's JSON line becomes OUR output.
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=child_timeout,
                               stdout=subprocess.PIPE, text=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt}: child timed out after "
                  f"{child_timeout}s (tunnel wedge?)", file=sys.stderr)
            last_err = "bench-timeout"
            continue
        line = None
        for cand in reversed((r.stdout or "").strip().splitlines()):
            try:
                parsed = json.loads(cand)
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, dict) and parsed.get("metric") == METRIC:
                line = cand
                break
        if r.returncode == 0 and line:
            print(line)
            return 0
        print(f"[bench] attempt {attempt}: child rc={r.returncode}, "
              f"json={'yes' if line else 'no'}", file=sys.stderr)
        last_err = "bench-failed"
    emit(0.0, 0.0, {"error": last_err})
    return 0


# --------------------------------------------------------------------------
# Child: the actual measurement
# --------------------------------------------------------------------------

def resolve_cascade(engine, batch):
    """(schedule, phases, caps) for the staged decode.

    Env overrides win; otherwise the on-chip schedule A/B artifact
    (scripts/layered_ab.py -> docs/layered_ab.json, or the path in
    LDPC_TPU_BENCH_AB_PATH) supplies tuned defaults when it recommends
    adoption AND was measured against the current kernel sources (the
    artifact records the BER-parity adjudication — the candidate within
    the flooding run's Monte-Carlo band at every SNR point — that
    justifies changing the schedule).  Fallbacks are the round-2 tuned
    flooding cascade (phase1=12, cap=3B/16).
    """
    schedule = os.environ.get("LDPC_TPU_BENCH_SCHEDULE")
    phases = caps = None
    ab_path = os.environ.get(
        "LDPC_TPU_BENCH_AB_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "docs", "layered_ab.json"))
    if (schedule is None and "LDPC_TPU_BENCH_PHASES" not in os.environ
            and engine == "pallas" and os.path.exists(ab_path)):
        with open(ab_path) as f:
            ab = json.load(f)
        from ldpc_tpu.utils.provenance import kernel_source_hash
        if ab.get("adopt") and ab.get("kernel_hash") == kernel_source_hash():
            rec = ab["recommended"]
            schedule = rec["schedule"]
            phases = [int(p) for p in rec["phases"]]
            caps = [max(128, batch * int(c) // 16)
                    for c in rec["caps_16ths"]]
            print(f"[bench] adopting tuned schedule from {ab_path}: "
                  f"{schedule} phases={phases}", file=sys.stderr)
        elif ab.get("adopt"):
            print(f"[bench] IGNORING stale {ab_path} (kernel sources "
                  "changed since the A/B; rerun scripts/layered_ab.py)",
                  file=sys.stderr)
    schedule = schedule or "flooding"
    if phases is None:
        phases = [int(p) for p in os.environ.get(
            "LDPC_TPU_BENCH_PHASES", "12").split(",")]
    if caps is None:
        caps = [int(c) for c in os.environ.get(
            "LDPC_TPU_BENCH_CAPS",
            str(max(128, batch * 3 // 16))).split(",")]
    if len(caps) == 1:
        caps = caps * len(phases)
    return schedule, phases, caps


def resolve_levers(engine):
    """Bit-identical kernel scheduling levers for the pallas engine.

    Env overrides win (LDPC_TPU_BENCH_TILE_B, LDPC_TPU_PALLAS_DEP_STRIDE,
    LDPC_TPU_PALLAS_POPCOUNT_SIGN); otherwise the on-chip scheduling A/B
    artifact (scripts/sched_ab.py -> docs/sched_ab.json, or the path in
    LDPC_TPU_BENCH_SCHED_AB_PATH) supplies the fastest variant when it
    recommends adoption AND was measured against the current kernel
    sources.  Unlike the schedule (which needs a BER adjudication), these
    levers are bit-identical by construction — the artifact records the
    shared-input exactness check.  ``None`` defers to the kernel's
    env-var defaults (ops/pallas_static.py).
    """
    levers = {"tile_b": None, "dep_stride": None, "popcount_sign": None}
    tile_env = os.environ.get("LDPC_TPU_BENCH_TILE_B")
    if tile_env:
        levers["tile_b"] = int(tile_env)
    env_stride = "LDPC_TPU_PALLAS_DEP_STRIDE" in os.environ
    env_pop = "LDPC_TPU_PALLAS_POPCOUNT_SIGN" in os.environ
    ab_path = os.environ.get(
        "LDPC_TPU_BENCH_SCHED_AB_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "docs", "sched_ab.json"))
    if engine != "pallas" or not os.path.exists(ab_path):
        return levers
    with open(ab_path) as f:
        ab = json.load(f)
    if not ab.get("adopt"):
        return levers
    from ldpc_tpu.utils.provenance import kernel_source_hash
    if ab.get("kernel_hash") != kernel_source_hash():
        print(f"[bench] IGNORING stale {ab_path} (kernel sources changed "
              "since the A/B; rerun scripts/sched_ab.py)", file=sys.stderr)
        return levers
    rec = ab["recommended"]
    if levers["tile_b"] is None:
        levers["tile_b"] = int(rec["tile_b"])
    if not env_stride:
        levers["dep_stride"] = int(rec["dep_stride"])
    if not env_pop:
        levers["popcount_sign"] = bool(rec["popcount_sign"])
    print(f"[bench] adopting tuned kernel levers from {ab_path}: "
          f"{levers} (speedup {rec.get('speedup_vs_default')}x in the "
          "A/B)", file=sys.stderr)
    return levers


def resolve_sort(engine):
    """Straggler-aware tiling lever (sort_words): difficulty-sort each
    batch so Pallas tiles of easy words exit early instead of every tile
    waiting on a straggler.  Bit-identical per-word outputs (permutation
    invariance), so adoption only needs a timing artifact:
    scripts/sort_ab.py -> docs/sort_ab.json.  LDPC_TPU_BENCH_SORT=0/1
    overrides."""
    env = os.environ.get("LDPC_TPU_BENCH_SORT")
    if env is not None:
        return bool(int(env))
    ab_path = os.environ.get(
        "LDPC_TPU_BENCH_SORT_AB_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "docs", "sort_ab.json"))
    if engine != "pallas" or not os.path.exists(ab_path):
        return False
    with open(ab_path) as f:
        ab = json.load(f)
    if not ab.get("adopt"):
        return False
    from ldpc_tpu.utils.provenance import kernel_source_hash
    if ab.get("kernel_hash") != kernel_source_hash():
        print(f"[bench] IGNORING stale {ab_path} (kernel sources changed "
              "since the A/B; rerun scripts/sort_ab.py)", file=sys.stderr)
        return False
    print(f"[bench] adopting sort_words from {ab_path} (speedup "
          f"{ab.get('speedup_sorted_vs_unsorted')}x in the A/B)",
          file=sys.stderr)
    return True


def resolve_store(engine, schedule):
    """Pallas VMEM storage dtype to use when LDPC_TPU_BENCH_DTYPE is
    unset.

    ``None`` keeps the kernel default (bfloat16).  int8 (Q4.3 fixed
    point, half the live set) is adopted from the quantized-BER study
    artifact (scripts/quantized_ber.py -> docs/quantized_ber.json, or
    LDPC_TPU_BENCH_QBER_PATH) when it recommends adoption, was measured
    against the current kernel sources, and the schedule is flooding —
    the study adjudicates int8 numerics under flooding only, and
    int8 x layered is a combination no artifact has adjudicated.
    """
    qb_path = os.environ.get(
        "LDPC_TPU_BENCH_QBER_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "docs", "quantized_ber.json"))
    if (engine != "pallas" or schedule != "flooding"
            or not os.path.exists(qb_path)):
        return None
    with open(qb_path) as f:
        qb = json.load(f)
    if not qb.get("adopt"):
        return None
    from ldpc_tpu.utils.provenance import kernel_source_hash
    if qb.get("kernel_hash") != kernel_source_hash():
        print(f"[bench] IGNORING stale {qb_path} (kernel sources changed "
              "since the study; rerun scripts/quantized_ber.py)",
              file=sys.stderr)
        return None
    store = qb["recommended"]["store_dtype"]
    print(f"[bench] adopting storage dtype {store} from {qb_path} "
          "(BER within the bfloat16 run's band at every point)",
          file=sys.stderr)
    return store


def measure():
    import jax
    if os.environ.get("LDPC_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])
    import jax.numpy as jnp

    from ldpc_tpu.codes import near_earth_code
    from ldpc_tpu.sim.evaluate import make_staged_sweep_device

    code = near_earth_code()
    max_iters = 50
    # Staging tuned on-chip (round 2 grid, docs/kernel_roofline.json):
    # 32k words/chip with phase1=12 and a 3B/16 redo capacity measured
    # 713 Mbit/s @3.4 dB vs 610 at the round-1 defaults (16k/10/B-over-4);
    # 64k adds ~1% for twice the HBM. nfail(12 iters)@3.4 dB is ~13% of
    # words, so the capacity keeps the failed-word re-decode in the
    # gather branch with margin while trimming padding-tile waste.
    batch = int(os.environ.get("LDPC_TPU_BENCH_BATCH",
                               jax.device_count() * 32768))
    engine = os.environ.get("LDPC_TPU_BENCH_ENGINE", "pallas")
    # LDPC_TPU_BENCH_DTYPE sets the Pallas VMEM storage dtype (default
    # bfloat16: the f32 kernel's ~22 MB scoped schedule sits at the edge
    # of physical VMEM and wedged the device at bench scale) or the XLA
    # engine's compute dtype.
    dtype_env = os.environ.get("LDPC_TPU_BENCH_DTYPE")
    # LDPC_TPU_BENCH_PRNG selects the channel-noise generator impl:
    # "rbg" (default: the TPU hardware RNG path — the fused transmit's
    # threefry keygen is a measurable slice of the dispatch; measured
    # 705 vs 684 Mbit/s @3.4 dB, +3%, with statistically identical BER)
    # or "threefry2x32" (bit-reproducible across backends — what every
    # BER-parity artifact and the test suite use; Monte-Carlo THROUGHPUT
    # only needs the noise distribution, not counter-mode
    # reproducibility).  Keys thread through fold_in/awgn unchanged.
    key = jax.random.key(7134066,
                         impl=os.environ.get("LDPC_TPU_BENCH_PRNG",
                                             "rbg"))

    # LDPC_TPU_BENCH_PHASES="p1[,p2,..]" / LDPC_TPU_BENCH_CAPS="c1[,c2,..]"
    # select a multi-stage cascade (each stage re-decodes the previous
    # stage's failures from scratch at a bigger budget; exactly
    # equivalent to a straight 50-iter decode by per-word latching).
    # LDPC_TPU_BENCH_SCHEDULE picks the kernel message schedule
    # ("flooding" reproduces the reference decoders; "layered" is the
    # serial-C production schedule, ~2x fewer sweeps to converge).
    #
    # Tuned defaults come from the on-chip schedule A/B artifact
    # (scripts/layered_ab.py -> docs/layered_ab.json) when it recommends
    # adoption, it was measured against the CURRENT kernel sources, and
    # no env override says otherwise.  The artifact records the BER-parity
    # adjudication (layered within the flooding run's Monte-Carlo band at
    # every SNR point) that justifies changing the schedule.
    schedule, phases, caps = resolve_cascade(engine, batch)
    levers = resolve_levers(engine)
    sort_words = resolve_sort(engine)
    adopted_store = None
    if dtype_env is None:
        adopted_store = resolve_store(engine, schedule)
        dtype_env = adopted_store

    def build(eng, dt):
        # Transmit + staged cascade fused into ONE dispatch per batch
        # (the second dispatch through the ~33 ms tunnel and the [B, n]
        # f32 LLR HBM round trip are pure overhead).
        step = make_staged_sweep_device(
            code, max_iters, phase1_iters=phases,
            redo_capacity=caps, engine=eng, sort_words=sort_words,
            **({"schedule": schedule} if eng == "pallas" else {}),
            **({k: v for k, v in levers.items() if v is not None}
               if eng == "pallas" else {}),
            **({"store_dtype": dt} if eng == "pallas" and dt else
               {"dtype": jnp.dtype(dt)} if dt else {}))

        def run(k, snr_arr):
            # device_get is the only reliable completion barrier through
            # the tunnelled backend (block_until_ready returns early).
            out = jax.device_get(step(k, snr_arr))
            return (out["errors_decoded"], out["iterations"],
                    out["success"])

        return run

    try:  # build + compile check; fall back if the kernel fails
        run = build(engine, dtype_env)
        run(jax.random.fold_in(key, 999),
            jnp.full((batch,), 3.4, jnp.float32))
    except Exception as e:  # noqa: BLE001 — any toolchain failure
        adopted = (engine == "pallas"
                   and (schedule != "flooding"
                        or adopted_store is not None
                        or sort_words
                        or any(v is not None for v in levers.values())))
        recovered = False
        if adopted:
            # an adopted (schedule x levers) combination was never
            # compiled together by the A/Bs — retry the pallas engine at
            # pure defaults before surrendering to the XLA engine
            print(f"[bench] tuned pallas config failed "
                  f"({type(e).__name__}); retrying pallas defaults",
                  file=sys.stderr)
            schedule, phases, caps = "flooding", [12], [
                max(128, batch * 3 // 16)]
            levers = {"tile_b": None, "dep_stride": None,
                      "popcount_sign": None}
            sort_words = False
            if adopted_store is not None:
                dtype_env = adopted_store = None
            try:
                run = build(engine, dtype_env)
                run(jax.random.fold_in(key, 999),
                    jnp.full((batch,), 3.4, jnp.float32))
                recovered = True
            except Exception as e2:  # noqa: BLE001
                e = e2
        if not recovered:
            print(f"[bench] engine {engine} failed ({type(e).__name__}); "
                  f"falling back to xla/f32", file=sys.stderr)
            engine = "xla"
            run = build(engine, None)
            run(jax.random.fold_in(key, 999),
                jnp.full((batch,), 3.4, jnp.float32))

    # Variance protocol (VERDICT r4 #3): N timed captures per SNR point
    # with DISTINCT inputs, report the MEDIAN and carry every trial in
    # the emitted JSON — a ±4% chip-weather swing is then visibly
    # variance, not a round-over-round regression.  (The reference
    # prints one-shot timings, ldpc.py:383-387.)
    trials = int(os.environ.get("LDPC_TPU_BENCH_TRIALS", "5"))
    detail = {}
    for si, snr in enumerate(SNR_POINTS):
        snr_arr = jnp.full((batch,), snr, jnp.float32)
        point_key = jax.random.fold_in(key, si)  # distinct per SNR point
        # untimed warm pass per point (lazy branch compiles must not
        # leak into timing)
        run(jax.random.fold_in(point_key, trials), snr_arr)
        bits = batch * code.n
        rates = []
        for t in range(trials):
            t0 = time.time()
            errs, iters, succ = run(
                jax.random.fold_in(point_key, t), snr_arr)
            rates.append(bits / (time.time() - t0))
        med = float(sorted(rates)[len(rates) // 2]) if trials % 2 else \
            float(sum(sorted(rates)[trials // 2 - 1:trials // 2 + 1]) / 2)
        detail[snr] = {
            "bit_per_s": med,
            "trials_bit_per_s": [round(r, 1) for r in rates],
            "ber": float(errs.sum()) / bits,
            "success_rate": float(succ.mean()),
            "avg_iterations": float(iters.mean()),
        }
        spread = (max(rates) - min(rates)) / med * 100
        print(f"[bench] snr {snr}: {med:,.0f} bit/s median of {trials} "
              f"(spread {spread:.1f}%)  BER {detail[snr]['ber']:.3e}  "
              f"iters {detail[snr]['avg_iterations']:.1f}  "
              f"batch {batch} engine {engine}", file=sys.stderr)

    # BER parity gate: the measured-parity artifact (scripts/ber_parity.py
    # -> docs/ber_parity.json) records, per SNR point, whether the Pallas
    # kernel's BER lies within the oracle-exact XLA engine's 95% CI and
    # whether the reference's published points (common.py:112-114) fall
    # inside the combined two-run Monte-Carlo band.  Surfaced here so a
    # regression fails loudly at bench time; engine equivalence on
    # converged words is separately exact (tests/test_pallas_static.py).
    # The artifact is stamped with a hash of the decode-path sources; a
    # mismatch means the gate is checking STALE data (warn, don't fail —
    # the fresh BER printed above is the live check).
    parity_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "ber_parity.json")
    if os.path.exists(parity_path):
        with open(parity_path) as f:
            parity = json.load(f)
        from ldpc_tpu.utils.provenance import kernel_source_hash
        stamped = parity.get("kernel_hash")
        current = kernel_source_hash()
        if stamped != current:
            print("[bench] WARNING: docs/ber_parity.json was recorded "
                  f"against kernel hash {str(stamped)[:12]} but sources "
                  f"are now {current[:12]} — rerun scripts/ber_parity.py",
                  file=sys.stderr)
        engines_ok = all(pt.get("engines_agree", True)
                         for pt in parity.get("points", {}).values())
        ref_ok = all(e["within_band"] for e in parity.get("reference", [])
                     if e["reference_ber"] > 0)
        agree = parity.get("reference_agreement")
        if not ref_ok and agree:
            # The gap vs the reference's PUBLISHED constants is
            # adjudicated in our favor: the reference's own decoder,
            # run on our channel words (scripts/reference_agreement.py),
            # agrees with our engines word-exactly and measures a BER
            # far from its published plot constants — those constants
            # are contaminated by a decoder-state-reuse bug in the
            # reference (ldpc.py:397,425).  See docs/ber_parity.md.
            ref_line = (f"reference_constants=adjudicated "
                        f"(raw within_band={ref_ok}; the adjudication "
                        "covers the PUBLISHED-constant gap only — ref's "
                        "own decoder agrees with the f64 oracle on "
                        f"{agree.get('oracle_word_exact', 0) * 100:.0f}% "
                        "of words and disowns its constants; see "
                        "docs/ber_parity.md.  Engine regressions are "
                        "gated separately by engines_agree)")
        else:
            ref_line = f"reference_within_band={ref_ok}"
        print(f"[bench] BER parity artifact: engines_agree={engines_ok} "
              f"{ref_line} fresh={stamped == current}", file=sys.stderr)
        assert engines_ok, (
            "Pallas kernel BER left the oracle engine's CI — rerun "
            "scripts/ber_parity.py and investigate before shipping")
    value = detail[3.4]["bit_per_s"]
    extra = {}
    # Roofline fraction (VERDICT r4 #4): measured throughput over the
    # kernel's speed-of-light — the throughput if every word paid exactly
    # its own convergence iterations at the best measured per-tile-
    # iteration cost (docs/kernel_roofline.md; the residual gap is the
    # adjudicated Mosaic scheduling property).  This is a VPU-bound
    # workload, so the roofline anchor is the measured per-tile-iter
    # cost, not MXU FLOPs.
    roof_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "kernel_roofline.json")
    if engine == "pallas" and os.path.exists(roof_path):
        with open(roof_path) as f:
            roof = json.load(f)
        tau_us = roof.get("us_per_tile_iter_mi10_best")
        if tau_us:
            tiles = -(-batch // 128)   # tile_b = 128, the kernel default
            ideal_s = tiles * detail[3.4]["avg_iterations"] * tau_us * 1e-6
            sol = batch * code.n / ideal_s
            extra["sol_bit_per_s"] = round(sol, 1)
            extra["mfu_fraction"] = round(value / sol, 4)
            print(f"[bench] roofline: speed-of-light {sol / 1e6:,.0f} "
                  f"Mbit/s @3.4 (tau {tau_us} us/tile-iter), measured "
                  f"fraction {value / sol:.3f}", file=sys.stderr)
    # Toolchain watch (ROADMAP): the Mosaic scheduling gap is a jaxlib
    # property — stamp the versions so a toolchain change is visible in
    # the round-over-round artifacts.
    import jaxlib
    extra["versions"] = {"jax": jax.__version__,
                         "jaxlib": jaxlib.__version__}
    extra["trials"] = {str(s): detail[s]["trials_bit_per_s"]
                       for s in SNR_POINTS}
    extra["sweep_bit_per_s"] = {str(s): round(detail[s]["bit_per_s"], 1)
                                for s in SNR_POINTS}
    extra["sweep_ber"] = {str(s): detail[s]["ber"] for s in SNR_POINTS}
    if engine == "pallas" and schedule != "flooding":
        # the schedule change is adjudicated by docs/layered_ab.json
        # (BER within the flooding run's Monte-Carlo band at every point)
        extra["schedule"] = schedule
    if engine == "pallas" and any(v is not None for v in levers.values()):
        extra["levers"] = {k: v for k, v in levers.items()
                           if v is not None}
    if sort_words:
        # bit-identical scheduling lever, adjudicated by docs/sort_ab.json
        extra["sort_words"] = True
    if adopted_store is not None:
        # adjudicated by docs/quantized_ber.json (int8 FER within the
        # bfloat16 run's Wilson CI at every point)
        extra["store_dtype"] = adopted_store
    emit(round(value, 1), round(value / BASELINE_AT_3P4, 2), extra)


def main():
    if os.environ.get("LDPC_TPU_BENCH_CHILD") == "1":
        measure()
    else:
        sys.exit(supervise())


if __name__ == "__main__":
    main()
