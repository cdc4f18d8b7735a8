"""Regenerate the BENCH_EXCHANGE_SNAPSHOT table in tests/test_plans.py.

When `test_bench_queries_exchange_snapshot` fails after an INTENTIONAL
plan change (or a new bench query), run this and paste the printed
entries — each line carries the broadcast/sort-merge join counts as a
comment so the reviewer can see what the plan does, not just how many
exchanges it has.

Usage: python tools/plan_snapshot.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all
from iceberg_by_example_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("plan-snapshot", master="local[8]", shuffle_partitions=8)
    _load_all()
    for name in sorted(n for n, s in QUERY_REGISTRY.items() if s.bench):
        df = QUERY_REGISTRY[name].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        p = buf.getvalue()
        n_ex = p.count("Exchange hashpartitioning")
        print(
            f'    "{name}": {n_ex},'
            f'  # bhj={p.count("BroadcastHashJoin")}'
            f' smj={p.count("SortMergeJoin")}'
        )
    spark.stop()


if __name__ == "__main__":
    main()
