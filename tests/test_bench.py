"""The headline bench must never leave a traceback as the round's record.

Round 2's official benchmark (BENCH_r02.json) was lost to a down tunnel:
``bench.py`` crashed in backend init with rc=1.  These tests pin the
supervisor contract: a dead backend yields rc=0 and one parseable JSON
line with an explicit error field; a live backend yields the metric line.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _run(env_extra, timeout=600):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("LDPC_TPU_BENCH")}
    env.pop("LDPC_TPU_PLATFORM", None)
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], env=env, timeout=timeout,
                          capture_output=True, text=True)


def _last_json(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout from bench.py: {stdout!r}"
    return json.loads(lines[-1])


def test_bench_dead_backend_emits_error_json():
    r = _run({"LDPC_TPU_PLATFORM": "bogus-backend",
              "LDPC_TPU_BENCH_PROBES": "1",
              "LDPC_TPU_BENCH_PROBE_SLEEP": "0",
              "LDPC_TPU_BENCH_ATTEMPTS": "2"}, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    line = _last_json(r.stdout)
    assert line["metric"] == "near_earth_decoded_throughput_3p4dB_50iters"
    assert line["error"] == "tpu-unavailable"
    assert line["value"] == 0.0


def test_bench_adopts_fresh_schedule_ab_artifact(tmp_path, monkeypatch):
    """resolve_cascade picks up a layered recommendation only when the
    artifact is fresh (kernel hash matches) and no env override exists."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ldpc_tpu.utils.provenance import kernel_source_hash

    for k in list(os.environ):
        if k.startswith("LDPC_TPU_BENCH"):
            monkeypatch.delenv(k, raising=False)
    art = tmp_path / "layered_ab.json"
    payload = {"adopt": True, "kernel_hash": kernel_source_hash(),
               "recommended": {"schedule": "layered", "phases": [6],
                               "caps_16ths": [3]}}
    art.write_text(json.dumps(payload))
    monkeypatch.setenv("LDPC_TPU_BENCH_AB_PATH", str(art))

    sched, phases, caps = bench.resolve_cascade("pallas", 32768)
    assert (sched, phases, caps) == ("layered", [6], [32768 * 3 // 16])

    # stale hash -> ignored, flooding defaults
    payload["kernel_hash"] = "deadbeef"
    art.write_text(json.dumps(payload))
    sched, phases, _ = bench.resolve_cascade("pallas", 32768)
    assert (sched, phases) == ("flooding", [12])

    # env override beats a fresh artifact
    payload["kernel_hash"] = kernel_source_hash()
    art.write_text(json.dumps(payload))
    monkeypatch.setenv("LDPC_TPU_BENCH_SCHEDULE", "flooding")
    sched, phases, _ = bench.resolve_cascade("pallas", 32768)
    assert sched == "flooding"

    # the XLA engine never adopts (layered is pallas-only)
    monkeypatch.delenv("LDPC_TPU_BENCH_SCHEDULE")
    sched, _, _ = bench.resolve_cascade("xla", 32768)
    assert sched == "flooding"


def test_bench_adopts_fresh_sched_ab_levers(tmp_path, monkeypatch):
    """resolve_levers adopts the fastest bit-identical variant from the
    sched A/B artifact when fresh; env overrides win; stale is ignored."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_mod2", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ldpc_tpu.utils.provenance import kernel_source_hash

    for k in list(os.environ):
        if k.startswith(("LDPC_TPU_BENCH", "LDPC_TPU_PALLAS")):
            monkeypatch.delenv(k, raising=False)
    art = tmp_path / "sched_ab.json"
    payload = {"adopt": True, "kernel_hash": kernel_source_hash(),
               "recommended": {"dep_stride": 4, "tile_b": 256,
                               "popcount_sign": True,
                               "speedup_vs_default": 1.25}}
    art.write_text(json.dumps(payload))
    monkeypatch.setenv("LDPC_TPU_BENCH_SCHED_AB_PATH", str(art))

    assert bench.resolve_levers("pallas") == {
        "tile_b": 256, "dep_stride": 4, "popcount_sign": True}
    # the XLA engine has no kernel levers
    assert bench.resolve_levers("xla") == {
        "tile_b": None, "dep_stride": None, "popcount_sign": None}
    # env overrides beat a fresh artifact, per lever
    monkeypatch.setenv("LDPC_TPU_BENCH_TILE_B", "128")
    monkeypatch.setenv("LDPC_TPU_PALLAS_DEP_STRIDE", "0")
    assert bench.resolve_levers("pallas") == {
        "tile_b": 128, "dep_stride": None, "popcount_sign": True}
    monkeypatch.delenv("LDPC_TPU_BENCH_TILE_B")
    monkeypatch.delenv("LDPC_TPU_PALLAS_DEP_STRIDE")
    # stale hash -> ignored entirely
    payload["kernel_hash"] = "deadbeef"
    art.write_text(json.dumps(payload))
    assert bench.resolve_levers("pallas") == {
        "tile_b": None, "dep_stride": None, "popcount_sign": None}


def test_sched_ab_artifact_writer_merges_and_recommends(tmp_path):
    """write_artifact merges invocations, recommends the fastest
    bit-identical bfloat16 variant, and never auto-recommends int8."""
    import importlib.util
    import types
    path = os.path.join(os.path.dirname(BENCH), "scripts", "sched_ab.py")
    spec = importlib.util.spec_from_file_location("sched_ab_mod", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    out = str(tmp_path / "sched_ab.json")
    args = types.SimpleNamespace(batch=16384, mi=10, snr=3.4,
                                 code="near-earth", store="bfloat16",
                                 trials=3, out=out)
    v = [(0, 128, False), (4, 128, False)]
    m.write_artifact(args, v, {v[0]: [0.150], v[1]: [0.120]},
                     {x: [10] for x in v}, {x: True for x in v})
    art = json.load(open(out))
    assert art["adopt"] and art["recommended"]["dep_stride"] == 4
    # second invocation merges; its faster popcount variant wins
    v2 = [(0, 128, False), (0, 128, True)]
    m.write_artifact(args, v2, {v2[0]: [0.150], v2[1]: [0.110]},
                     {x: [10] for x in v2}, {x: True for x in v2})
    art = json.load(open(out))
    assert len(art["entries"]) == 3
    assert art["recommended"]["popcount_sign"] is True
    # an even faster int8 entry is recorded but never recommended
    args.store = "int8"
    m.write_artifact(args, [v[0]], {v[0]: [0.050]}, {v[0]: [12]},
                     {v[0]: False})
    art = json.load(open(out))
    assert art["recommended"]["popcount_sign"] is True
    assert "s0_t128_p0_int8" in art["entries"]
    # a non-exact variant is never recommended
    args.store = "bfloat16"
    m.write_artifact(args, v2, {v2[0]: [0.150], v2[1]: [0.040]},
                     {x: [10] for x in v2},
                     {v2[0]: True, v2[1]: False})
    art = json.load(open(out))
    assert art["recommended"]["dep_stride"] == 4
    assert art["recommended"]["popcount_sign"] is False


def test_bench_adopts_int8_store_only_under_flooding(tmp_path, monkeypatch):
    """resolve_store adopts the quantized-BER verdict when fresh and the
    schedule is flooding; layered or a stale hash blocks adoption."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_mod4", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ldpc_tpu.utils.provenance import kernel_source_hash

    art = tmp_path / "quantized_ber.json"
    payload = {"adopt": True, "kernel_hash": kernel_source_hash(),
               "recommended": {"store_dtype": "int8"}}
    art.write_text(json.dumps(payload))
    monkeypatch.setenv("LDPC_TPU_BENCH_QBER_PATH", str(art))

    assert bench.resolve_store("pallas", "flooding") == "int8"
    assert bench.resolve_store("pallas", "layered") is None
    assert bench.resolve_store("xla", "flooding") is None
    payload["kernel_hash"] = "deadbeef"
    art.write_text(json.dumps(payload))
    assert bench.resolve_store("pallas", "flooding") is None


def test_quantized_ber_adjudication():
    """int8 adoption requires every point inside the bf16 Wilson band,
    no BER blow-up, and a speedup at the operating point."""
    import importlib.util
    path = os.path.join(os.path.dirname(BENCH), "scripts",
                        "quantized_ber.py")
    spec = importlib.util.spec_from_file_location("qber_mod", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    def pts(fers, bers, mbits):
        return [{"fer": f, "ber": b, "mbit_s": s}
                for f, b, s in zip(fers, bers, mbits)]

    snr, words = [3.0, 3.4], 32768
    good = {"stores": {
        "bfloat16": pts([0.1, 0.01], [1e-3, 1e-5], [600, 700]),
        "int8": pts([0.102, 0.0101], [1.05e-3, 1.05e-5], [800, 900])}}
    r = m.adjudicate(dict(good), snr, words)
    assert r["adopt"] and r["recommended"] == {"store_dtype": "int8"}
    # slower at the operating point -> no adoption
    slow = json.loads(json.dumps(good))
    slow["stores"]["int8"][1]["mbit_s"] = 600
    assert not m.adjudicate(slow, snr, words)["adopt"]
    # FER outside the Wilson band -> no adoption
    bad = json.loads(json.dumps(good))
    bad["stores"]["int8"][0]["fer"] = 0.12
    assert not m.adjudicate(bad, snr, words)["adopt"]
    # int8 errors where bf16 is clean -> no adoption
    dirty = json.loads(json.dumps(good))
    dirty["stores"]["bfloat16"][1]["ber"] = 0.0
    dirty["stores"]["bfloat16"][1]["fer"] = 0.0
    assert not m.adjudicate(dirty, snr, words)["adopt"]


def test_bench_falls_back_to_pallas_defaults_before_xla(tmp_path,
                                                        monkeypatch,
                                                        capsys):
    """If the adopted (schedule x levers) combination fails to compile,
    measure() retries the pallas engine at pure defaults before
    surrendering to the XLA engine."""
    import importlib.util
    import numpy as np
    spec = importlib.util.spec_from_file_location("bench_mod3", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ldpc_tpu.utils.provenance import kernel_source_hash

    for k in list(os.environ):
        if k.startswith(("LDPC_TPU_BENCH", "LDPC_TPU_PALLAS")):
            monkeypatch.delenv(k, raising=False)
    # a fresh artifact that adopts the layered schedule
    art = tmp_path / "layered_ab.json"
    art.write_text(json.dumps(
        {"adopt": True, "kernel_hash": kernel_source_hash(),
         "recommended": {"schedule": "layered", "phases": [6],
                         "caps_16ths": [3]}}))
    monkeypatch.setenv("LDPC_TPU_BENCH_AB_PATH", str(art))
    monkeypatch.setenv("LDPC_TPU_BENCH_BATCH", "8")
    monkeypatch.setenv("LDPC_TPU_BENCH_TRIALS", "1")

    calls = []

    def fake_factory(code, max_iters, **kw):
        calls.append(kw)
        if kw.get("schedule", "flooding") != "flooding":
            raise RuntimeError("tuned kernel rejected")

        def step(key, snr_db):
            b = snr_db.shape[0]
            return {"errors_decoded": np.zeros(b, np.int64),
                    "iterations": np.full(b, 3, np.int32),
                    "success": np.ones(b, bool)}

        return step

    import ldpc_tpu.sim.evaluate as ev
    monkeypatch.setattr(ev, "make_staged_sweep_device", fake_factory)
    bench.measure()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] > 0 and "error" not in line
    # first build: the adopted layered config; second: pallas defaults
    # (flooding, no levers) — never the XLA engine
    assert calls[0].get("schedule") == "layered"
    assert calls[1].get("schedule") == "flooding"
    assert all(c.get("engine", "xla") == "pallas" for c in calls[:2])
    assert len(calls) == 2


def test_bench_cpu_smoke_emits_metric_json():
    # Tiny batch, single trial, XLA engine: the full supervisor->child
    # pipeline on the CPU backend.  ~1 min.
    r = _run({"LDPC_TPU_PLATFORM": "cpu",
              "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
              "LDPC_TPU_BENCH_BATCH": "32",
              "LDPC_TPU_BENCH_ENGINE": "xla",
              "LDPC_TPU_BENCH_TRIALS": "1",
              "LDPC_TPU_BENCH_CAPS": "16"}, timeout=580)
    assert r.returncode == 0, r.stderr[-2000:]
    line = _last_json(r.stdout)
    assert line["metric"] == "near_earth_decoded_throughput_3p4dB_50iters"
    assert "error" not in line
    assert line["value"] > 0
    assert line["vs_baseline"] > 0
    # r5 variance protocol: every capture carries the per-trial rates
    # and the full per-point sweep so chip-weather spread is visible in
    # the artifact itself (VERDICT r4 #3).
    assert set(line["trials"]) == set(line["sweep_bit_per_s"])
    for snr, rates in line["trials"].items():
        assert len(rates) == 1          # TRIALS=1 in this smoke
        assert line["sweep_bit_per_s"][snr] > 0
    assert set(line["sweep_ber"]) == set(line["sweep_bit_per_s"])


def test_readme_regen_renders_median_table(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(BENCH), "scripts"))
    try:
        import update_readme_bench as urb
    finally:
        sys.path.pop(0)
    parsed = {"sweep_bit_per_s": {"3.0": 2.5e8, "3.4": 7e8},
              "trials": {"3.0": [2.4e8, 2.5e8, 2.6e8],
                         "3.4": [6.9e8, 7.0e8, 7.1e8]},
              "mfu_fraction": 0.55, "sol_bit_per_s": 1.27e9}
    block = urb.render(parsed, "BENCH_r05.json")
    assert "| 3.4 dB | 700 Mbit/s" in block
    assert "trials" in block and "speed-of-light" in block
    readme = tmp_path / "README.md"
    readme.write_text("x\n<!-- bench:begin -->\nOLD\n<!-- bench:end -->\ny")
    monkeypatch.setattr(urb, "README", str(readme))
    monkeypatch.setattr(sys, "argv", ["update_readme_bench",
                                      "--from-json", "/dev/null"])
    import json as _json
    fj = tmp_path / "cap.json"
    fj.write_text(_json.dumps(parsed))
    monkeypatch.setattr(sys, "argv", ["update_readme_bench",
                                      "--from-json", str(fj)])
    assert urb.main() == 0
    text = readme.read_text()
    assert "OLD" not in text and "700 Mbit/s" in text
    assert text.startswith("x\n") and text.endswith("\ny")
