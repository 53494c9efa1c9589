"""Round-5 ledger runner: execute the config-4 / config-5 / interactive
measurements IN SEQUENCE (one TPU process at a time — each config runs in
its own subprocess per the flagship-scale one-specialization-per-process
discipline, PROGRESS.md round 3) and append their JSON lines to
LEDGER_r05.json so the claims are machine-checkable like BENCH_r*.json
(VERDICT r4 next #5).

Usage: python tools/run_ledger_r5.py [quick]
  quick = skip config 5 (the 1024^3 world build takes ~10 min cold)
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
LEDGER = ROOT / "LEDGER_r05.json"


def run(cmd: list[str], tag: str, timeout: float = 3600):
    print(f"--- {tag}: {' '.join(cmd)}", flush=True)
    t0 = time.monotonic()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                          timeout=timeout)
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            row["_tag"] = tag
            rows.append(row)
    print(proc.stdout[-2000:], flush=True)
    if proc.returncode != 0:
        print(proc.stderr[-2000:], flush=True)
        rows.append({"_tag": tag, "error": f"rc={proc.returncode}"})
    print(f"--- {tag} done in {time.monotonic() - t0:.0f}s", flush=True)
    return rows


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    ledger = []
    if LEDGER.exists():
        ledger = json.loads(LEDGER.read_text())
    py = sys.executable
    ledger += run([py, "tools/bench_scale.py", "4"], "config4")
    if not quick:
        ledger += run([py, "tools/bench_scale.py", "5:auto"],
                      "config5-paged-edits")
    ledger += run([py, "tools/measure_interactive.py", "1920", "1080",
                   "40"], "interactive-1080p")
    ledger += run([py, "tools/measure_interactive.py", "1920", "1080",
                   "60", "2"], "interactive-1080p-ds2")
    ledger += run([py, "tools/measure_interactive.py", "640", "360", "60"],
                  "interactive-640")
    LEDGER.write_text(json.dumps(ledger, indent=1))
    print(f"wrote {LEDGER} ({len(ledger)} rows)", flush=True)


if __name__ == "__main__":
    main()
