"""Local replica of the driver's correctness gate.

Runs every registry query at sf0.01 in Spark AND its DuckDB oracle,
then compares row count, sorted column names, and an order-insensitive
canonical value multiset.

Oracle results are fetched through DuckDB's pandas conversion
(``res.df()``), NOT ``fetchall()``, because the driver hashes through
pandas: an uncast integer SUM (DuckDB HUGEINT) becomes float64 there
and hash-mismatches Spark's BIGINT on value-identical results (the
round-3 false-fails). Going through the same conversion makes that
class of bug reproduce locally — local green ⇒ driver green.

Usage: python tools/check_correctness.py [name ...]
       CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_correctness.py
       CHECK_BARE_SESSION=1 python tools/check_correctness.py
           (stock SparkSession, as the grading driver builds one —
            catches any query depending on our tuned confs)
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

import duckdb

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def from_pandas(v):
    """Normalize a pandas/numpy cell to the plain-Python value the
    driver's canonicalization would see."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.ndarray):
        return [from_pandas(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [from_pandas(x) for x in v]
    if isinstance(v, dict):
        return {k: from_pandas(x) for k, x in v.items()}
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.generic):  # numpy scalar → python scalar
        return v.item()
    return v


# Queries where the midnight-datetime→date collapse fired this run.
# The collapse mirrors driver leniency (see canon below) but widens a
# blind spot — a genuine timestamp-vs-date column divergence whose
# values all land at midnight would slip through — so the gate PRINTS a
# note whenever it actually fires instead of collapsing silently.
MIDNIGHT_COLLAPSED = 0


def canon(v):
    """Canonical form for one value, identical across engines."""
    global MIDNIGHT_COLLAPSED
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, dt.datetime):
        v = v.replace(tzinfo=None)
        # A midnight-naive datetime canonicalizes as a DATE: DuckDB's
        # pandas conversion renders DATE columns as midnight
        # datetime64 while Spark's toPandas keeps datetime.date, and
        # the driver grades those green (r3: events_retention_cohorts)
        # — so the local gate must too. Counted so the per-query note
        # makes the leniency visible (see MIDNIGHT_COLLAPSED).
        if v.time() == dt.time(0, 0):
            MIDNIGHT_COLLAPSED += 1
            return f"d:{v.date().isoformat()}"
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def row_multiset(columns, rows):
    """Order-insensitive canonical multiset, columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    only = set(sys.argv[1:])
    sys.path.insert(0, "/root/repo")
    from iceberg_by_example_spark.session import get_spark
    from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all

    _load_all()
    if os.environ.get("CHECK_BARE_SESSION"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("correctness-check-bare")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark(
            "correctness-check", master="local[8]", shuffle_partitions=8
        )

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        # single file (driver testdata) or a Spark-written directory
        # of part files (the bench-generated sf1 corpus)
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
        except duckdb.IOException:
            # partial corpora (sf1 carries only documents/embeddings/
            # lineitem) — queries over the missing tables fail loudly
            # on their own
            pass

    passed, failed = [], []
    for name, spec in sorted(QUERY_REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR)
            scols = sdf.columns
            # Through pandas on the Spark side too — the driver converts
            # BOTH results via pandas before hashing, so both sides must
            # see identical canonicalization (dates → Timestamp, nullable
            # ints → float64, etc.).
            spdf = sdf.toPandas()
            srows = [
                tuple(from_pandas(v) for v in row)
                for row in spdf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if spec.oracle is None:
            print(f"ok   {name} (rows-only: {len(srows)} rows) {time.time()-t0:.1f}s")
            passed.append(name)
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            # Through pandas, as the driver hashes (HUGEINT→float64
            # shows up here; fetchall() would hide it).
            odf = res.df()
            orows = [
                tuple(from_pandas(v) for v in row)
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            global MIDNIGHT_COLLAPSED
            before = MIDNIGHT_COLLAPSED
            sm = row_multiset([c.lower() for c in scols], srows)
            om = row_multiset([c.lower() for c in ocols], orows)
            if MIDNIGHT_COLLAPSED > before:
                print(
                    f"note {name}: {MIDNIGHT_COLLAPSED - before} "
                    "midnight-naive datetimes collapsed to dates "
                    "(driver-leniency mirror — check column types if "
                    "unexpected)"
                )
            if sm != om:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)[:400]}")
        else:
            passed.append(name)
            print(f"ok   {name} ({len(srows)} rows) {time.time()-t0:.1f}s")

    print(f"\n{len(passed)} passed, {len(failed)} failed")
    for name, why in failed:
        print(f"  FAIL {name}: {why[:300]}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
