"""r14 tokenizer re-probe (r13 VERDICT #8).

The r13 pin-and-release trade persisted the tokenizers' corpus pass
across its three-consumer fan-out (3x -> 1x corpus passes at scale)
at a documented ~0.4 s sf0.1 floor cost. This tool puts MEASURED
numbers behind both halves of that trade:

1. 10x probes for ``text_bpe_tokenize`` / ``text_unigram_tokenize``
   via tools/probe_one.py (fresh JVM per probe, per-pass canary),
   retried across host windows until the floor pass lands at a quiet
   canary (<= 1.2) — the r13 retry-until-quiet discipline.
2. The corpus-pass count asserted from the Hadoop-FS scan counters
   (the composition_report calibration trick): one calibrated fresh
   corpus scan's footer/dictionary footprint divides the per-query
   byte delta into "how many times was the corpus parquet actually
   opened and decoded". The claim is ~1 decode per tokenize run
   (planning footer reads add a fraction); 3+ would mean the persist
   regressed.

Writes/merges the results into PROBES_r14.json.

Usage: python tools/probe_tokenizers.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

QUERIES = ["text_bpe_tokenize", "text_unigram_tokenize"]
QUIET_CANARY = 1.2
MAX_RETRIES = 4


def fs_bytes_read(spark) -> int:
    it = (
        spark._jvm.org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics()
        .iterator()
    )
    tot = 0
    while it.hasNext():
        v = it.next().getLong("bytesRead")
        tot += v if v else 0
    return tot


def quiesce(spark) -> None:
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    spark._jvm.System.gc()
    time.sleep(1)


def scan_execs(spark, sf_dir: str) -> dict:
    """Calibrated corpus-decode count per tokenizer run at sf_dir."""
    from pyspark.sql import functions as F

    import bench

    bench._load_extra_bench()

    quiesce(spark)
    cal0 = fs_bytes_read(spark)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).agg(
        F.sum(F.length("text"))
    ).collect()
    scan_kb = max(fs_bytes_read(spark) - cal0, 1)

    out = {}
    for name in QUERIES:
        fn = bench.EXTRA_BENCH_FNS[name]
        quiesce(spark)
        b0 = fs_bytes_read(spark)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        time.sleep(1)
        delta = fs_bytes_read(spark) - b0
        out[name] = {
            "footer_kb": round(delta / 1024, 1),
            "per_scan_kb": round(scan_kb / 1024, 1),
            "corpus_scan_execs": round(delta / scan_kb, 2),
        }
    return out


def probe_10x(sf1_dir: str, sf_dir: str) -> dict:
    records = {}
    for name in QUERIES:
        retry_log = []
        best = None
        for _ in range(MAX_RETRIES):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "probe_one.py"),
                     name, sf1_dir, "2"],
                    capture_output=True, text=True, timeout=1800,
                    env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                )
                if out.returncode != 0 or not out.stdout.strip():
                    raise RuntimeError(
                        f"probe_one rc={out.returncode}: "
                        + out.stderr.strip()[-400:]
                    )
                r = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception as exc:  # record, keep probing
                retry_log.append(
                    {"error": f"{type(exc).__name__}: {exc}"}
                )
                continue
            retry_log.append(
                {
                    "passes": r["passes"],
                    "canaries": r["pass_canaries"],
                    "canary_mc_ratio": r.get("canary_mc_ratio"),
                }
            )
            cand = (r["floor_canary_ratio"], r["floor_sec"])
            if best is None or cand < best[0:2]:
                best = (r["floor_canary_ratio"], r["floor_sec"], r)
            if r["floor_canary_ratio"] <= QUIET_CANARY:
                break
        if best is None:
            records[name] = {
                "data_dir": sf1_dir,
                "replicas": 10,
                "error": "every probe attempt failed",
                "retry_log": retry_log,
            }
            continue
        records[name] = {
            "data_dir": sf1_dir,
            "replicas": 10,
            "floor_sec": best[1],
            "floor_canary_ratio": best[0],
            "retry_log": retry_log,
        }
    return records


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from iceberg_by_example_spark.session import get_spark

    spark = get_spark("probe-tokenizers")
    import bench

    sf1_dir = bench._ensure_sf1(spark, sf_dir)
    execs = scan_execs(spark, sf_dir)
    spark.stop()

    records = probe_10x(sf1_dir, sf_dir)
    for name in QUERIES:
        records[name]["corpus_pass_counter"] = execs[name]

    path = os.path.join(ROOT, "PROBES_r14.json")
    merged = {}
    if os.path.exists(path):
        merged = json.load(open(path))
    merged.setdefault(
        "note",
        "r14 probes. Tokenizer re-probe (VERDICT r13 #8): 10x floors"
        " via probe_one.py (fresh JVM, per-pass canary,"
        " retry-until-quiet <=1.2), plus the corpus-pass count"
        " measured from the calibrated Hadoop-FS scan counters — the"
        " r13 persist trade's 3x->1x claim as a number"
        " (corpus_scan_execs ~1 = one decode per run; planning footer"
        " reads contribute the fraction).",
    )
    merged.setdefault("tokenizers_10x", {}).update(records)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(json.dumps(records, indent=1))


if __name__ == "__main__":
    main()
