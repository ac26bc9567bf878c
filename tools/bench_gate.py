#!/usr/bin/env python3
"""Cross-round bench regression gate (VERDICT r03 item #8).

Runs ``bench.py`` (or takes a results JSON on stdin / as a file arg) and
diffs each per-query timing against the BEST prior driver-recorded round
(min across all ``BENCH_r*.json`` in the repo root). Exit 1 if any query
regressed more than ``--factor`` (default 1.5x) -- the q3 +14% drift in
r03 would have warned here before the driver measured it.

Usage:
    python tools/bench_gate.py                 # runs bench.py, gates it
    python tools/bench_gate.py BENCH.json      # gate an existing result
    python bench.py | python tools/bench_gate.py -   # pipe mode

Comparison protocol caveat (BASELINE.md): driver rounds are n-rep
best-of on the driver's schedule; local runs tend to be faster. A LOCAL
run beating the gate therefore does not prove the driver round will,
but a local run FAILING it is a real early warning. New queries (no
prior round) pass trivially and are listed as "new".
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_prior() -> dict[str, float]:
    """Per-query minimum across every driver-recorded round."""
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            rec = json.load(f)
        queries = (rec.get("parsed") or {}).get("queries") or {}
        for name, sec in queries.items():
            if isinstance(sec, (int, float)):
                best[name] = min(best.get(name, float("inf")), float(sec))
    return best


def load_current(arg: str | None) -> dict:
    if arg == "-":
        lines = [ln for ln in sys.stdin.read().splitlines() if ln.strip().startswith("{")]
        return json.loads(lines[-1])
    if arg:
        with open(arg) as f:
            rec = json.load(f)
        return (rec.get("parsed") or rec) if "parsed" in rec else rec
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True, timeout=900,
    ).stdout
    lines = [ln for ln in out.splitlines() if ln.strip().startswith("{")]
    return json.loads(lines[-1])


def main(argv: list[str]) -> int:
    factor = 1.5
    args = []
    it = iter(argv)
    for a in it:
        if a == "--factor":
            factor = float(next(it))
        else:
            args.append(a)

    current = load_current(args[0] if args else None)
    prior = best_prior()
    bad: list[str] = []
    for name, sec in sorted((current.get("queries") or {}).items()):
        ref = prior.get(name)
        if ref is None:
            print(f"{name:32s} {sec:7.3f}s  (new, no prior round)")
            continue
        ratio = sec / ref if ref else float("inf")
        flag = "REGRESSION" if ratio > factor else "ok"
        print(f"{name:32s} {sec:7.3f}s  vs best {ref:7.3f}s  x{ratio:.2f}  {flag}")
        if ratio > factor:
            bad.append(name)
    total = current.get("value")
    # host load annotation (VERDICT r07 item 4): a uniform elevation
    # across untouched plans under nontrivial load is environmental, not
    # a code regression -- print it next to the verdict so the artifact
    # self-diagnoses.
    load = current.get("loadavg")
    try:
        now_load = ", ".join(f"{v:.2f}" for v in os.getloadavg())
    except OSError:
        now_load = "n/a"
    print(
        f"\ntotal {total}s; gate x{factor}; {len(bad)} regression(s); "
        f"loadavg(bench)={load}; loadavg(now)=[{now_load}]"
    )
    if bad:
        print("FAILED:", ", ".join(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
