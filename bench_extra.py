#!/usr/bin/env python
"""Round-8 optimization measurement harness (guide §1.1/§1.4/§1.5).

NOT the driver bench — bench.py is frozen for measurement.  This file
exists so the optimization round can (a) isolate single queries with the
noop sink, (b) capture .explain("formatted") plans into plans/r08/, and
(c) A/B candidate changes with alternating reps (first-of-shape warm-up
bias rule, CLAUDE.md).  Numbers from here are cited in
OPTIMIZATION_r08.md next to the official bench.py artifacts.

Usage:
  python bench_extra.py plans [name ...]        # capture explain files
  python bench_extra.py time <name> [reps]      # noop-timed, stage deltas
  python bench_extra.py suffix=<tag> plans ...  # write <name>_<tag>.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness reused for query builders)

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r08")


def all_queries():
    qs = dict(bench.BENCH_QUERIES)
    qs.update(bench._registry_queries())
    return qs


def get_session():
    from elevation_service_spark.session import get_spark
    return get_spark(app="bench-extra", cpus=bench.CPUS,
                     extra_conf={"spark.ui.retainedStages": "100000",
                                 "spark.ui.retainedJobs": "100000"})


def capture_plan(spark, name, fn, suffix):
    import contextlib
    import io
    df = fn(spark, bench.SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    os.makedirs(PLAN_DIR, exist_ok=True)
    path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)} chars)")


def time_query(spark, name, fn, reps):
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
        before = bench._stage_totals(spark)
        t0 = time.time()
        bench._force(fn(spark, bench.SF_DIR))
        wall = round(time.time() - t0, 3)
        after = bench._stage_totals(spark)
        delta = (None if before is None or after is None
                 else {k: after[k] - before[k] for k in after})
        walls.append(wall)
        print(f"{name} rep{i}: wall={wall}s delta={delta}", flush=True)
    print(f"{name}: walls={walls} min={min(walls)}")


def main():
    args = sys.argv[1:]
    suffix = "before"
    if args and args[0].startswith("suffix="):
        suffix = args[0].split("=", 1)[1]
        args = args[1:]
    mode, rest = args[0], args[1:]
    qs = all_queries()
    spark = get_session()
    try:
        if mode == "plans":
            names = rest or list(qs)
            for n in names:
                try:
                    capture_plan(spark, n, qs[n], suffix)
                except Exception as exc:
                    print(f"PLAN FAIL {n}: {exc!r}", flush=True)
        elif mode == "time":
            name = rest[0]
            reps = int(rest[1]) if len(rest) > 1 else 3
            # same-shape warm-up excluded (first-of-shape bias)
            bench._force(qs[name](spark, bench.SF_DIR))
            time_query(spark, name, qs[name], reps)
        else:
            raise SystemExit(f"unknown mode {mode}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
