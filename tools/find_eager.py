"""Derive the EAGER query set empirically: build (but do NOT execute)
every queries() entry at sf0.001 and record which builders submit Spark
jobs during construction — the census-collect / driver-loop contract
(bradley_terry, pelt, BPE training, k-means...). Used to maintain
registry.EAGER_QUERIES. Usage:
  python tools/find_eager.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from kinesis_stream_reader_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("find_eager", cpus=8)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    eager: list[str] = []
    for name, fn in entrymod.queries().items():
        group = f"eagerprobe_{name}"
        sc.setJobGroup(group, name)
        try:
            fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"BUILD-ERROR {name}: {exc}", flush=True)
            continue
        finally:
            sc.setJobGroup("", "")
        jobs = tracker.getJobIdsForGroup(group)
        if jobs:
            eager.append(name)
            print(f"EAGER {name}: {len(jobs)} jobs", flush=True)
        # hygiene: stop stray streams a builder may have started
        for s in spark.streams.active:
            s.stop()
    print("EAGER_QUERIES = {")
    for name in sorted(eager):
        print(f'    "{name}",')
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
