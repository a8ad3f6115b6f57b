"""Fresh-JVM re-probe for scale-sweep gate flags.

The sweep runs ~80 queries x 2 scales in ONE shared local JVM; its
trailing passes execute in the most GC/page-cache-polluted regime, so
a small-base entry's ratio can read several x above its honest value
(r14: b3_d1_d2_population_explode read 8.6x in-sweep, 1.3x fresh).
This tool is the adjudication step promoted into a subprocess: for
each named query, a FRESH session (new JVM) runs one warmup plus 4
warm passes at sf0.1 and sf1 and reports the median walls and ratio
as one JSON line on stdout — the same methodology used by hand in the
r13/r14 SCALE1.md adjudication tables.

Usage: python tools/scale_reprobe.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/bhps_sf1"
PASSES = 4


def main() -> None:
    from bow_hunter_pipeline_spark import registry
    from bow_hunter_pipeline_spark.session import get_spark

    names = [n for n in sys.argv[1:] if not n.startswith("-")]
    if not names:
        sys.exit("usage: scale_reprobe.py <query> [query ...]")
    spark = get_spark(
        app_name="bhps-scale-reprobe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    qs = registry.queries()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        per: dict[str, float] = {}
        for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            qs[name](spark, sf_dir).count()  # warmup
            walls = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                walls.append(time.perf_counter() - t0)
            per[sf_name] = statistics.median(walls)
        per["ratio"] = (
            per["sf1"] / per["sf0.1"] if per["sf0.1"] > 0 else float("inf")
        )
        out[name] = per
        print(
            f"{name}: {per['sf0.1']:.3f} -> {per['sf1']:.3f} "
            f"= {per['ratio']:.1f}x",
            file=sys.stderr,
        )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
