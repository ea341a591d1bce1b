"""Regenerate tests/slow_manifest.txt from a pytest --durations=0 log.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/full.log 2>&1
    python scripts/update_slow_manifest.py /tmp/full.log

Tests with call duration >= THRESHOLD seconds land in the manifest;
tests/conftest.py marks them `slow` and everything else `fast`, making
`pytest -m fast` (~3.5 min) the default iteration loop.
"""

import re
import sys
from pathlib import Path

THRESHOLD = 5.0


def main(log_path: str) -> int:
    rows = []
    for line in open(log_path):
        m = re.match(r"^([0-9.]+)s call\s+(\S+)", line)
        if m:
            rows.append((float(m.group(1)), m.group(2)))
    if not rows:
        print(f"no duration lines found in {log_path}", file=sys.stderr)
        return 1
    slow = sorted(((d, n) for d, n in rows if d >= THRESHOLD), reverse=True)
    out = Path(__file__).resolve().parent.parent / "tests" / "slow_manifest.txt"
    with open(out, "w") as f:
        f.write("# test node IDs with call duration >= 5s in the last "
                "full-suite\n")
        f.write("# run; regenerate: python -m pytest tests/ -q "
                "--durations=0 > log\n")
        f.write("# then scripts/update_slow_manifest.py log\n")
        for _, n in slow:
            f.write(f"{n}\n")
    fast_min = sum(d for d, n in rows if d < THRESHOLD) / 60
    print(f"{out}: {len(slow)} slow tests; fast tier ~{fast_min:.1f} min")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))
