"""One-shot verification: every gate this repo must pass, in order.

Runs (1) the full oracle-parity sweep at sf0.01, (2) the
registry-wide output-type gate (driver pandas-hashability), (3) the
same sweep under the hostile-driver emulation (stock session,
non-UTC zone), (4) the strict raw-value probe over the whole
registry, (5) the physical-plan audit, (6) pytest. Stops at the
first failing gate.

Usage:
    python tools/verify_all.py            # all gates (~15-25 min)
    python tools/verify_all.py --fast     # gates 1+4 only (~5 min)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"


def run(name: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"==> {name}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    proc = subprocess.run(cmd, cwd=REPO, env=e)
    if proc.returncode != 0:
        print(f"GATE FAILED: {name}")
        sys.exit(proc.returncode)


def main() -> None:
    fast = "--fast" in sys.argv
    run("oracle sweep", [sys.executable, "tools/check_oracle.py", SF])
    run("output-type gate", [sys.executable, "tools/type_gate.py"])
    run("plan audit", [sys.executable, "tools/plan_audit.py"])
    if fast:
        print("ALL GATES PASS (fast)")
        return
    probe = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '.');"
         "from etl_pipeline_4handling_listings_spark.queries import REGISTRY;"
         "print(len(REGISTRY))"],
        cwd=REPO, capture_output=True, text=True,
    )
    if probe.returncode != 0:
        print("GATE FAILED: registry import probe")
        print(probe.stderr)
        sys.exit(1)
    n_queries = probe.stdout.strip()
    run(
        "hostile-driver sweep (plain session, non-UTC)",
        [sys.executable, "tools/check_oracle.py", SF],
        env={"SPARK_GRAFT_PLAIN": "1",
             "SPARK_GRAFT_TZ": "America/New_York"},
    )
    run(
        "strict raw-value probe",
        [sys.executable, "tools/strict_hash_probe.py", SF,
         "--window", n_queries],
    )
    run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    print("ALL GATES PASS")


if __name__ == "__main__":
    main()
