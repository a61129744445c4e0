#!/usr/bin/env python
"""Full value-parity sweep at sf0.1 (10× the driver's sf0.01 gate).

Compares EVERY oracle-bearing ``queries()`` entry cell-for-cell against its
DuckDB oracle at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) —
the engine's own evidence that the exactness discipline (decimal sums,
integer ranking keys, mirrored expression algebra) survives a 10× scale-up,
not just the scale the driver checks. Cited by BASELINE.md's "sf0.1 full
value-parity sweep" notes; re-run per round.

Usage: python tools/parity_sf01_sweep.py [--names a,b,c]
Pass signal: exit 0 and a final ``mismatches: 0`` line.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sys.path.insert(0, os.path.join(REPO, "tests"))
from oracle_harness import duck_connection, normalize, type_check  # noqa: E402

from pulsar_topic_deduplicator_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--names":
        only = set(sys.argv[2].split(","))
    # the TUNED session: this sweep's job is VALUE parity at 10× scale
    # (sf0.1 collects need the 8g driver heap — a plain 1g session OOMs);
    # config-independence is the driver's own sf0.01 gate and the /verify
    # driver-sim's plain-session job, not this harness's
    spark = get_spark("parity-sf01-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_connection(SF_DIR)
    names = [n for n in qs if n in oracles and (only is None or n in only)]
    print(f"sweeping {len(names)} oracle-bearing entries at {SF_DIR}")
    t0 = time.time()
    mismatches = 0
    for i, name in enumerate(names, 1):
        t = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            got = normalize(df.columns, [tuple(r) for r in df.collect()])
            rel = con.sql(oracles[name])
            want = normalize(rel.columns, rel.fetchall())
            tc = type_check(df, rel)
            ok = got == want and tc is None
        except Exception as exc:  # a crash is a mismatch, not a skip
            ok, got, want, tc = False, [("ERR", repr(exc))], [], None
        mismatches += not ok
        status = "OK  " if ok else "FAIL"
        print(
            f"{status} [{i}/{len(names)}] {name} rows={len(got)} "
            f"{time.time() - t:.1f}s" + (f" type:{tc}" if tc else "")
        )
        if not ok and got and want:
            for a, b in zip(got, want):
                if a != b:
                    print("  spark:", a[:6], "\n  duck :", b[:6])
                    break
        # parity runs must not accumulate state across entries
        from pulsar_topic_deduplicator_spark.cachereg import release_all

        release_all()
        spark.catalog.clearCache()
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):  # localCheckpoint leftovers (see bench.py hygiene note)
            rdd.unpersist()
    print(f"mismatches: {mismatches} ({time.time() - t0:.0f}s total)")
    spark.stop()
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
