"""Mechanical driver-window rotation (COVERAGE.md "Driver-window
rotation policy", set in r08).

Reads every ``CORRECTNESS_r*.json`` in the repo root, computes the
union of driver-GREEN rows (rows+schema+hash all true), and rewrites
``testlog_etl_spark/suite.py``'s ``DRIVER_WINDOW`` region as:

1. fix-first slots: any query RED in the LATEST round (it must be
   re-signed after its fix);
2. backlog drain: the next never-signed names, in the stable queue
   order (registration order of the frozen registry, as captured in
   the existing backlog-queue comment — falling back to registry
   order for names the comment doesn't carry);
3. once the backlog is empty: ~5 recurring-anchor slots (bench-set
   members first) ahead of re-sign rotation, per policy item 3.

The tool only PRINTS the proposed window by default; ``--write``
rewrites suite.py in place (the tuple and the regenerated backlog
comment). Always re-run ``python tools/verify_all.py --window`` and
``python tools/output_type_lint.py --window`` after a rewrite — the
rotation is mechanical, the gate is not.

Usage:
    python tools/rotate_window.py            # dry-run: print window
    python tools/rotate_window.py --write    # rewrite suite.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SUITE = os.path.join(REPO, "testlog_etl_spark", "suite.py")
WINDOW_SIZE = 50
ANCHOR_SLOTS = 5


def correctness_rounds() -> list[tuple[int, dict]]:
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        with open(path) as f:
            out.append((int(m.group(1)), json.load(f)))
    return sorted(out)


def green(rec: dict) -> bool:
    return bool(rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"))


def queue_order(registry_names: list[str]) -> list[str]:
    """Stable backlog order: the ACTIVE window's tuple entries first
    (they are this round's in-flight signing candidates — if the round's
    CORRECTNESS artifact hasn't landed yet they are still unsigned and
    must stay at the FRONT, not demote to the tail), then the names in
    the suite.py backlog comment (the frozen queue), then any stragglers
    in registry order. Both appear inside the DRIVER_WINDOW region in
    file order (entries above, backlog comment below), so one ordered
    scan of the region yields exactly that precedence."""
    with open(SUITE) as f:
        src = f.read()
    m = re.search(r"DRIVER_WINDOW: tuple\[str, \.\.\.\] = \((.*?)\n\)", src, re.S)
    reg = set(registry_names)
    seen: list[str] = []
    for line in m.group(1).splitlines():
        ls = line.strip()
        if ls.startswith("#"):
            toks = re.findall(r"[a-z][a-z0-9_]{3,}", ls)
        else:
            toks = re.findall(r'"([a-z][a-z0-9_]{3,})"', ls)
        for tok in toks:
            if tok in reg and tok not in seen:
                seen.append(tok)
    return seen + [n for n in registry_names if n not in set(seen)]


def build_window() -> tuple[list[str], list[str], dict]:
    from testlog_etl_spark import suite

    suite._load_all()
    registry = list(suite.REGISTRY)

    rounds = correctness_rounds()
    signed: set[str] = set()
    for _, d in rounds:
        signed.update(k for k, v in d.items() if green(v))
    latest = rounds[-1][1] if rounds else {}
    fix_first = [k for k, v in latest.items() if not green(v) and k in set(registry)]

    order = queue_order(registry)
    backlog = [n for n in order if n not in signed and n not in set(fix_first)]

    window = list(fix_first)
    if backlog:
        window += backlog[: WINDOW_SIZE - len(window)]
    remaining = [n for n in backlog if n not in set(window)]
    if len(window) < WINDOW_SIZE:  # drained: anchor slots + re-sign rotation
        anchors = [n for n, c in suite.REGISTRY.items() if c.bench and n not in set(window)]
        window += anchors[: max(0, min(ANCHOR_SLOTS, WINDOW_SIZE - len(window)))]
        # oldest-signed-first re-rotation for the rest
        last_round: dict[str, int] = {}
        for rnum, d in rounds:
            for k, v in d.items():
                if green(v):
                    last_round[k] = rnum
        rest = sorted(
            (n for n in registry if n not in set(window)),
            key=lambda n: (last_round.get(n, 0), registry.index(n)),
        )
        window += rest[: WINDOW_SIZE - len(window)]
    stats = {
        "registry": len(registry),
        "signed_union": len(signed),
        "fix_first": fix_first,
        "backlog_after": len(remaining),
    }
    return window, remaining, stats


def rewrite(window: list[str], remaining: list[str], stats: dict) -> None:
    with open(SUITE) as f:
        src = f.read()
    start = src.index("# The driver harness verifies the FIRST 50 entries")
    end = src.index("\n)\n", start) + 3

    intro = (
        "# The driver harness verifies the FIRST 50 entries of queries() against the\n"
        "# DuckDB oracle each round; later entries get no correctness row. The order\n"
        "# below is a curated verification window, rotated per round so the UNION of\n"
        "# rounds covers the whole registry (COVERAGE.md tracks the cumulative set;\n"
        "# tools/rotate_window.py regenerates this region mechanically).\n"
        "#\n"
        f"# Signed union before this window: {stats['signed_union']}/{stats['registry']}; "
        f"fix-first re-signs: {stats['fix_first'] or 'none'};\n"
        f"# backlog remaining after this window: {stats['backlog_after']}.\n"
    )
    lines = ["DRIVER_WINDOW: tuple[str, ...] = ("]
    for n in window:
        lines.append(f'    "{n}",')
    if remaining:
        lines.append("    # -- BACKLOG QUEUE (never-driver-signed remain, in sign-next")
        lines.append("    #    order; subsequent windows take from the front; registry")
        lines.append("    #    stays frozen until the union covers the whole registry):")
        for w in textwrap.wrap(", ".join(remaining), width=66):
            lines.append("    #    " + w)
    lines.append(")")
    with open(SUITE, "w") as f:
        f.write(src[:start] + intro + "\n".join(lines) + "\n" + src[end:])


def main(argv: list[str]) -> int:
    window, remaining, stats = build_window()
    print(json.dumps(stats, indent=2))
    for i, n in enumerate(window, 1):
        print(f"{i:3d}. {n}")
    if "--write" in argv:
        rewrite(window, remaining, stats)
        print(f"\nrewrote {SUITE}; re-run verify_all --window + output_type_lint --window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
