#!/usr/bin/env python3
"""Measured shuffle/input volumes per headline query ("measure, don't
guess"): runs each bench query at $SPARK_GRAFT_SF_DIR and reports, from
Spark's own stage metrics (REST API of the local UI), the bytes that
actually crossed an exchange -- the quantity every SCALE.md claim is
about. A query whose plan "shuffles only 8-byte keys" should show
shuffle bytes ~1-2 orders below its input bytes; a regression that
drags a payload column through an exchange shows up here before it
shows up as wall-clock at 100 TB.

Usage: python tools/shuffle_audit.py [QUERY ...]   (default: bench set)
Prints one JSON line per query: input records, shuffle write bytes and
records, shuffle BYTES PER RECORD (the claim-checker: an exchange said
to carry "8-byte keys" must show a small row width, never the payload's
hundreds of bytes), and peak single-stage shuffle. (The REST
inputBytes metric under-reports for columnar parquet scans -- records
are the reliable input measure.)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = int(os.environ.get("SPARK_GRAFT_AUDIT_PORT", "4052"))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("shuffle-audit")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    from testlog_etl_spark import suite

    qs = suite.queries()
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        n for n, c in suite.REGISTRY.items() if c.bench
    ]

    base = f"http://localhost:{UI_PORT}/api/v1"
    app_id = _get(f"{base}/applications")[0]["id"]

    def stage_ids() -> set[int]:
        return {s["stageId"] for s in _get(f"{base}/applications/{app_id}/stages")}

    # warm-up so JVM/codegen startup stages don't pollute the first query
    qs[wanted[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in wanted:
        before = stage_ids()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        stages = [
            s
            for s in _get(f"{base}/applications/{app_id}/stages")
            if s["stageId"] not in before and s["status"] == "COMPLETE"
        ]
        in_rec = sum(s.get("inputRecords", 0) for s in stages)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        sw_rec = sum(s.get("shuffleWriteRecords", 0) for s in stages)
        peak = max((s.get("shuffleWriteBytes", 0) for s in stages), default=0)
        print(
            json.dumps(
                {
                    "query": name,
                    "stages": len(stages),
                    "input_records": in_rec,
                    "shuffle_write_mb": round(sw / 1e6, 3),
                    "shuffle_records": sw_rec,
                    # the claim-checker: a shuffle said to carry "8-byte
                    # keys" must show a small row width here, never the
                    # payload's hundreds of bytes
                    "shuffle_bytes_per_record": round(sw / sw_rec, 1) if sw_rec else None,
                    "peak_stage_shuffle_mb": round(peak / 1e6, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
