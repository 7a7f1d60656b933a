"""tools/profile_summary.py parses a jax Chrome trace into an op cost table."""
import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_profile_summary_on_synthetic_trace(tmp_path):
    run_dir = tmp_path / "plugins" / "profile" / "run1"
    run_dir.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python host"}},
        {"ph": "X", "pid": 7, "name": "%convolution.42", "dur": 900.0, "ts": 0},
        {"ph": "X", "pid": 7, "name": "%fusion.7", "dur": 100.0, "ts": 900},
        {"ph": "X", "pid": 1, "name": "host_thing", "dur": 5000.0, "ts": 0},
    ]
    with gzip.open(run_dir / "x.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_summary.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert "conv (MXU)" in r.stdout and "90.0%" in r.stdout
    # host lane excluded
    assert "host_thing" not in r.stdout
