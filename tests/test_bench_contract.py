"""Driver contract: bench.py must print exactly one JSON line with the agreed
schema, and __graft_entry__ must expose entry()/dryrun_multichip."""

import json
import os
import subprocess
import sys


def test_bench_smoke_json_contract():
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "bench.py", "--smoke", "--batch", "2", "--iters", "1"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    # median-of-N honesty fields (VERDICT r3 weak #5): the headline is a
    # median block and the JSON carries the spread
    assert rec["n_runs"] >= 1 and rec["spread_pct"] >= 0
    assert rec["metric"] == "nav_steps_per_sec_per_chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_graft_entry_exports():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)


def test_dryrun_multichip_driver_shape():
    """Run dryrun_multichip(8) exactly as the driver does: import the module
    in a fresh process (JAX_PLATFORMS still pinned to the TPU platform, no
    XLA_FLAGS device-count override) and call the function directly.  The
    function itself must force the 8-device virtual CPU mesh — round 1
    shipped with the forcing only under __main__ and the driver check failed
    (MULTICHIP_r01.json ok=false)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # simulate the pinned env var
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dryrun_multichip OK" in out.stdout, out.stdout
