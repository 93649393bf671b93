#!/usr/bin/env python
"""Per-query optimization harness (guide §1): time individual
``queries()`` entries through the noop sink in isolation and capture
their ``explain("formatted")`` plans.

Usage:
  python tools/opt_bench.py [--sf DIR] [--samples N] [--plans TAG]
                            [--plans-dir plans/rNN] q1 q2 ...

With ``--plans before`` the formatted plan of each query is written to
``<plans-dir>/<query>_before.txt`` (the judge-facing plan evidence);
``--plans-dir`` defaults to ``plans/r<N>`` where N is 1 + the highest
committed ``BENCH_r*.json`` round (the round currently being built).
Timing methodology matches bench.py: untimed warm run first (plan
compilation, UDF shipping), then N timed noop materializations with
GC hygiene between samples; min and all samples are reported."""

from __future__ import annotations

import argparse
import gc
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from flink_window_dgim_traffic_spark.session import get_spark, table  # noqa: E402


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--plans", default=None, help="plan file tag (before/after)")
    ap.add_argument(
        "--plans-dir",
        default=None,
        help="plan evidence directory (default: plans/r<current round>)",
    )
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="opt_bench")
    table(spark, args.sf, "events").count()  # session warm-up

    qs = entrymod.queries()
    if args.plans_dir:
        plans_dir = os.path.join(REPO, args.plans_dir)
    else:
        import re as _re

        ns = [
            int(m.group(1))
            for f in os.listdir(REPO)
            if (m := _re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        plans_dir = os.path.join(REPO, "plans", f"r{max(ns, default=0) + 1}")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query: {name}", file=sys.stderr)
            results[name] = None  # explicit error entry, not a silent drop
            continue
        spark.sparkContext.setJobDescription(f"opt_bench:{name}")
        df = None
        if not args.no_warm:
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(args.samples):
            gc.collect()
            spark._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            gc.collect()
        results[name] = samples
        print(f"{name}: min={min(samples):.3f}s samples={samples}", flush=True)
        if args.plans and df is not None:
            path = os.path.join(plans_dir, f"{name}_{args.plans}.txt")
            with open(path, "w") as fh:
                fh.write(formatted_plan(df))
            print(f"  plan -> {path}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {k: (min(v) if v else None) for k, v in results.items()},
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
