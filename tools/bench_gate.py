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


def best_prior() -> tuple[dict[str, float], dict[str, float]]:
    """Per-query minima across every driver-recorded round.

    Returns ``(best_raw, best_norm)``: raw wall seconds, and — for rounds
    whose artifact carries ``cpu_ref_sec`` (r08+) — the VM-speed-normalized
    minimum ``sec / cpu_ref_sec``. The r08 addendum in BASELINE.md proved
    raw best-priors from the fast-VM era (r01–r06) measure the host as much
    as the code, so the normalized channel is the authoritative one when
    both sides carry the reference-workload field."""
    best_raw: dict[str, float] = {}
    best_norm: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or {}
        queries = parsed.get("queries") or {}
        cpu_ref = parsed.get("cpu_ref_sec")
        for name, sec in queries.items():
            if isinstance(sec, (int, float)):
                best_raw[name] = min(best_raw.get(name, float("inf")), float(sec))
                if isinstance(cpu_ref, (int, float)) and cpu_ref > 0:
                    best_norm[name] = min(
                        best_norm.get(name, float("inf")), float(sec) / float(cpu_ref)
                    )
    return best_raw, best_norm


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
    prior_raw, prior_norm = best_prior()
    cur_ref = current.get("cpu_ref_sec")
    cur_ref = float(cur_ref) if isinstance(cur_ref, (int, float)) and cur_ref > 0 else None
    bad: list[str] = []
    for name, sec in sorted((current.get("queries") or {}).items()):
        raw_ref = prior_raw.get(name)
        if raw_ref is None:
            print(f"{name:32s} {sec:7.3f}s  (new, no prior round)")
            continue
        # Normalized channel (VERDICT r08 item 4): compare
        # (sec / cpu_ref_sec) against the best prior normalized value,
        # when BOTH sides measured the single-thread reference workload.
        if cur_ref is not None and name in prior_norm:
            ratio = (sec / cur_ref) / prior_norm[name] if prior_norm[name] else float("inf")
            tag = "norm"
        else:
            ratio = sec / raw_ref if raw_ref else float("inf")
            tag = "raw*" if cur_ref is None or name not in prior_norm else "raw"
        flag = "REGRESSION" if ratio > factor else "ok"
        print(
            f"{name:32s} {sec:7.3f}s  vs best {raw_ref:7.3f}s  "
            f"x{ratio:.2f} ({tag})  {flag}"
        )
        if ratio > factor:
            bad.append(name)
    if any(name not in prior_norm for name in (current.get("queries") or {})):
        print(
            "(raw*: prior rounds for this query predate cpu_ref_sec — the\n"
            " fast-VM-era caveat applies: a >1x raw ratio can be host speed,\n"
            " not code; see BASELINE.md r08 addendum)"
        )
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
