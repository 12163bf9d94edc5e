"""Round-4 quiet-window measurement orchestrator.

Phases (each waits for loadavg < threshold, then runs with a fresh
JVM): a full bench.py suite, then the two matched scaling pairs
(4->16 and 2->8, levels back-to-back inside one window, fresh JVM per
level via BENCH/run_scaling.py --child), then a repeat of each pair,
then a second bench.py run. Results land as JSON lines in
/tmp/r4_sweep/ with loadavg stamps so the analysis can reject
load-contaminated phases (the matched-conditions rule in
BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SWEEP_OUT", "/tmp/r4_sweep")
PAGES = os.environ.get(
    "SWEEP_PAGES", "/tmp/htmlparser2_spark_bench/pages_x480"
)
THRESH = float(os.environ.get("SWEEP_THRESH", "1.0"))
WAIT_TIMEOUT = 40 * 60  # per phase; run anyway after this, stamped


def loadavg() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def wait_quiet(tag: str) -> float:
    t0 = time.time()
    while time.time() - t0 < WAIT_TIMEOUT:
        la = loadavg()
        if la < THRESH:
            return la
        time.sleep(15)
    return loadavg()  # timed out: run anyway, honestly stamped


def run(cmd: list[str], timeout: int = 1800) -> str:
    subprocess.run(["pkill", "-x", "java"], capture_output=True)
    time.sleep(2)
    env = {**os.environ, "PYTHONPATH": REPO}
    p = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO,
        env=env,
    )
    return p.stdout + ("\n[STDERR]\n" + p.stderr[-2000:] if p.returncode else "")


def bench_phase(tag: str) -> None:
    la0 = wait_quiet(tag)
    out = run([sys.executable, "bench.py"])
    la1 = loadavg()
    line = next((ln for ln in out.splitlines() if ln.startswith("{")), "{}")
    rec = {"phase": tag, "load_start": la0, "load_end": la1,
           "result": json.loads(line) if line.startswith("{") else out[-500:]}
    with open(f"{OUT}/{tag}.json", "w") as fh:
        json.dump(rec, fh)


def child(cpus: int) -> dict:
    out = run([sys.executable, "BENCH/run_scaling.py", "--child",
               str(cpus), PAGES])
    for ln in out.splitlines():
        if ln.startswith("CHILD_RESULT "):
            d = json.loads(ln[len("CHILD_RESULT "):])
            d.pop("lineage", None)
            return d
    return {"error": out[-800:], "cpus": cpus}


def pair_phase(tag: str, lo: int, hi: int) -> None:
    la0 = wait_quiet(tag)
    a = child(lo)
    mid = loadavg()
    b = child(hi)
    la1 = loadavg()
    eff = None
    if "docs_per_sec" in a and "docs_per_sec" in b:
        eff = round(b["docs_per_sec"] / (4 * a["docs_per_sec"]), 3)
    rec = {"phase": tag, "load_start": la0, "load_mid": mid,
           "load_end": la1, "low": a, "high": b, "efficiency": eff}
    with open(f"{OUT}/{tag}.json", "w") as fh:
        json.dump(rec, fh)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    bench_phase("bench_runA")
    pair_phase("pair_4_16_rep1", 4, 16)
    pair_phase("pair_2_8_rep1", 2, 8)
    pair_phase("pair_4_16_rep2", 4, 16)
    pair_phase("pair_2_8_rep2", 2, 8)
    bench_phase("bench_runB")
    print("SWEEP DONE")


if __name__ == "__main__":
    main()
