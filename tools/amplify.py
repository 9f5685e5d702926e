"""Amplify the driver's sf0.1 fixtures into a throwaway 50x-class
dataset for the scale probe documented in SCALING.md.

Replication recipe (kept identical across rounds so numbers compare):

- events   x50 (5M rows)  — event_id offset per copy; users unchanged,
  so per-user row counts grow 50x (stresses window/session operators)
- lineitem x50, orders x50 — orderkeys offset per copy IN LOCKSTEP so
  the lineitem<->orders join keys stay consistent
- documents x20 (100k)    — doc_id offset, text IDENTICAL per copy:
  every doc becomes a 20-member exact/near-dup group (stresses dedup
  candidate generation and component convergence)
- embeddings x20 (40k)    — vec_id offset (vec 0 keeps its id: ANN
  queries' fixed query vector), labels unchanged
- dimension tables (region nation customer supplier part) symlinked
  unchanged — they are the broadcast side by design

Usage:  python tools/amplify.py [src_sf_dir] [out_dir]
Then:   SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kinesis_stream_reader_spark.session import get_spark  # noqa: E402

OFFSET = 100_000_000
FACTORS = {"events": 50, "lineitem": 50, "orders": 50, "documents": 20, "embeddings": 20}
ID_COLS = {
    "events": ("event_id",),
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
PASSTHROUGH = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ksr_amplified"
    # optional multiplier on every factor: `... 2` doubles the recipe to
    # 100x events / 40x docs — the third scale point for super-linear
    # SCALING rows (is the growth a sort constant or a quadratic term?)
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    # optional 5th arg: comma-separated subset of factor tables to
    # amplify (e.g. `documents,embeddings` for the 100x flagship
    # probes); unselected factor tables are symlinked unchanged so the
    # output dir still loads as a complete fixture
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    if only is not None and (bad := only - set(FACTORS)):
        # a typo'd name would otherwise silently symlink everything
        # unchanged and hand a baseline-sized fixture to a "100x" probe
        raise SystemExit(
            f"unknown factor table(s) {sorted(bad)}; choose from "
            f"{sorted(FACTORS)}"
        )
    spark = get_spark("amplify")
    os.makedirs(out, exist_ok=True)
    passthrough = list(PASSTHROUGH)
    for table, base_n in FACTORS.items():
        if only is not None and table not in only:
            passthrough.append(table)
            continue
        n = base_n * mult
        df = spark.read.parquet(f"{src}/{table}.parquet")
        copies = spark.range(n).withColumnRenamed("id", "_copy")
        amplified = df.crossJoin(copies)
        for id_col in ID_COLS[table]:
            amplified = amplified.withColumn(
                id_col, F.col(id_col) + F.col("_copy") * OFFSET
            )
        amplified.drop("_copy").write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: x{n} -> {out}/{table}.parquet")
    for table in passthrough:
        dst = f"{out}/{table}.parquet"
        if os.path.islink(dst) or os.path.isfile(dst):
            os.remove(dst)
        elif os.path.isdir(dst):
            shutil.rmtree(dst)
        os.symlink(f"{src}/{table}.parquet", dst)
    print("done:", out)
    spark.stop()


if __name__ == "__main__":
    main()
