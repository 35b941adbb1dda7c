"""Driver-contract tests: bench.py emits one valid JSON line; graft entry works."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny", "--quick"],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["value"] > 0
    assert rec["unit"] == "images/sec"
    # round-3 field honesty (VERDICT r2 #8): names say what they compute
    assert "sample100_mean_pipelined_ms_per_image" in rec["extra"]
    assert "sample100_p50_ms_per_image_synced" in rec["extra"]
    assert "sample100_ms_per_image_batched" in rec["extra"]
    assert rec["extra"]["sustained_images_per_sec"] > 0
