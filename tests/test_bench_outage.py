"""bench.py must never waste a driver capture (VERDICT r4 item 2).

Rounds 3 and 4 of driver BENCH artifacts were raw stack traces
(``rc=1, parsed: null``) because the benchmark let the backend-init
failure escape. The contract now: on ANY backend failure bench.py
exits 0 and prints one parseable JSON record carrying
``backend: "unavailable"`` plus the last driver-verified number.
"""
import json
import os
import pathlib
import subprocess
import sys

BENCH = pathlib.Path(__file__).parent.parent / "bench.py"


def test_forced_outage_emits_structured_record():
    env = dict(os.environ, BENCH_FORCE_OUTAGE="1")
    r = subprocess.run([sys.executable, str(BENCH)], capture_output=True,
                       text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {r.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["backend"] == "unavailable"
    assert rec["metric"] == "audio_app_1080p_msaa4_two_pass_pixels_shaded"
    assert rec["unit"] == "Mpixel/s/chip"
    assert isinstance(rec["last_verified"], float)
    assert "FORCE_OUTAGE" in rec["error"]


def test_probe_timeout_is_bounded_and_parseable():
    """A hanging backend init (the real outage mode) is cut off by the
    subprocess timeout and still yields the structured record."""
    env = dict(os.environ, BENCH_PROBE_TIMEOUT_S="1",
               # Make the probe subprocess hang deterministically: a
               # sitecustomize that sleeps pre-import, on an isolated path.
               PYTHONPATH=str(pathlib.Path(__file__).parent / "_hangsite"))
    env.pop("BENCH_FORCE_OUTAGE", None)
    r = subprocess.run([sys.executable, str(BENCH)], capture_output=True,
                       text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["backend"] == "unavailable"
    assert "hang" in rec["error"]
