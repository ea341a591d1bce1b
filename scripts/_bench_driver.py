"""Shared helper for scripts that run bench.py as a subprocess and parse
its one-JSON-line driver contract (lever_sweep, train_spread,
bench_configs)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_overrides: dict, tail_stderr: int = 2000):
    """Run bench.py with the given env overrides; return the parsed JSON
    record, or None on failure (diagnostics go to stderr either way)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env={**os.environ, **env_overrides}, capture_output=True, text=True,
        cwd=REPO,
    )
    sys.stderr.write(proc.stderr[-tail_stderr:])
    lines = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not lines:
        print(f"bench failed rc={proc.returncode} env={env_overrides}",
              file=sys.stderr, flush=True)
        return None
    return json.loads(lines[-1])


def write_artifact(name: str, payload: dict) -> str:
    path = os.path.join(REPO, "docs", name)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {path}", flush=True)
    return path
