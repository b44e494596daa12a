"""Per-stage profile of a catalog query — the drill-down companion to
tools/plan_audit.py (which shows plan SHAPE; this shows where the
TIME and shuffle BYTES actually go).

Runs the named query once untimed (warmup: JIT + worker spawn + scan
cache), then once timed, and prints the timed run's completed stages
sorted by executor run time: task count, executor time, input bytes,
shuffle read/write bytes. This is how the round-5/6 perf wins were
located (e.g. the b13 driver-side literal-tree discovery started from
a profile showing almost NO executor time against seconds of
wall-clock).

Usage: python tools/profile_query.py <query_name> [sf_dir]
       (sf_dir defaults to /root/testdata/sf0.1)

Uses its own SparkSession with the UI enabled (the repo's default
session disables it) and reads the REST status API — no event-log
config needed.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: profile_query.py <query_name> [sf_dir]")
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName(f"profile-{name}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.port.maxRetries", "64")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_sorted_spark.queries import QUERIES

    if name not in QUERIES:
        raise SystemExit(
            f"unknown query {name!r}; known: {', '.join(sorted(QUERIES))}"
        )

    def force() -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    force()  # warmup
    t0 = time.time() * 1000  # REST timestamps are epoch-millis
    t_wall = time.monotonic()
    force()
    wall = time.monotonic() - t_wall

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)

    def ms(s):
        # submissionTime is an ISO string like "2026-08-14T08:00:00.000GMT"
        from datetime import datetime, timezone

        raw = s.get("submissionTime")
        if not raw:
            return 0.0
        dt = datetime.strptime(raw.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        return dt.astimezone(timezone.utc).timestamp() * 1000

    timed = [s for s in stages if ms(s) >= t0 - 5]
    timed.sort(key=lambda s: -s["executorRunTime"])
    print(f"query={name} sf={sf_dir} wall={wall:.2f}s "
          f"stages_in_timed_run={len(timed)}")
    hdr = (f"{'stage':>5} {'tasks':>5} {'exec_ms':>8} {'input_mb':>9} "
           f"{'sh_read_mb':>10} {'sh_write_mb':>11}  name")
    print(hdr)
    for s in timed[:20]:
        print(
            f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
            f"{s['executorRunTime']:>8} "
            f"{s['inputBytes'] / 1e6:>9.1f} "
            f"{s['shuffleReadBytes'] / 1e6:>10.1f} "
            f"{s['shuffleWriteBytes'] / 1e6:>11.1f}  "
            f"{s['name'][:70]}"
        )
    total_exec = sum(s["executorRunTime"] for s in timed)
    print(f"total executor ms: {total_exec}  (wall {wall * 1000:.0f} ms x "
          f"{os.environ.get('SPARK_GRAFT_CPUS', '32')} cores available)")


if __name__ == "__main__":
    main()
