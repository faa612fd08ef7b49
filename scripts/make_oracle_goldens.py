"""Regenerate the committed-golden oracle fixtures (sf0.01 pins).

For every query in ``__spark_entry__.GOLDEN_ORACLE_QUERIES`` — the ops
whose semantics have no SQL form — run the Spark query at sf0.01 and pin
its result as ``tests/fixtures/oracle/<name>.parquet`` (written by
Spark's own parquet writer so the schema round-trips exactly; DuckDB
re-reads the file as the oracle side of the driver's rows+schema+hash
comparison).

These goldens are REGRESSION PINS, not independent derivations; run this
script only after an intended semantics change, and say so in the
commit. Independent validation of the pinned behavior lives in pytest
(hand-authored fixtures, superset/recall cross-checks, unit tests).

Run: python scripts/make_oracle_goldens.py [sf_dir] [name ...]

With names given, only those pins are regenerated — adding a NEW golden
query must not silently refresh every existing pin (a refresh would mask
an accidental semantics drift in an untouched operator).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from sparkocr.session import get_spark

    only = sys.argv[2:]
    unknown = set(only) - set(entrymod.GOLDEN_ORACLE_QUERIES)
    if unknown:
        raise SystemExit(f"not golden-oracle queries: {sorted(unknown)}")
    out_dir = entrymod._oracle_fixture_dir()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(cores=8, app_name="make-oracle-goldens",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in (only or entrymod.GOLDEN_ORACLE_QUERIES):
        df = qs[name](spark, sf)
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "out")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))
            assert len(part) == 1, part
            dest = os.path.join(out_dir, f"{name}.parquet")
            shutil.copyfile(part[0], dest)
        n = spark.read.parquet(dest).count()
        print(f"pinned {name}: {n} rows -> {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
