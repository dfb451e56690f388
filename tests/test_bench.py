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
