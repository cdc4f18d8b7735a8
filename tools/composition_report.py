"""Measure the composed curation pipeline's scan sharing.

The claim under test (r12 VERDICT "What's missing" #2): the composed
``pipeline_curate_corpus`` shares ONE persisted corpus scan across all
its stages, where a stage-by-stage chain — each stage materialized
separately, the way a naive multi-job pipeline runs — re-decodes the
corpus parquet once per corpus-scanning stage. Counters, all measured
over the WHOLE run (so detach/persist boundaries can't hide pre-pin
stages the way the per-plan SHUFFLE_BYTES walker does):

- parquet scan executions: Hadoop FS global statistics bytesRead.
  Measured property of this Spark build: the vectorized reader's
  data-page reads bypass BOTH the task-input-bytes metric and this
  counter, but every scan execution's footer/dictionary reads land
  here — so after calibrating the per-scan footprint with one fresh
  uncached corpus scan, the delta divides into "how many times was
  the corpus parquet actually opened and decoded". (Task input bytes
  are useless as a discriminator here: cached-block reads — the
  pinned corpus, but also each variant's detached stage outputs and
  the LR scorer's internal persists — dominate it in BOTH variants.)
- shuffle bytes written: executor-cumulative totalShuffleWrite —
  composition must NOT change what the exchanges carry.
- wall-clock per variant.

Both variants run in ONE session, chain FIRST (so the composed run
cannot silently benefit from a cache the chain warmed: all pinned
blocks are dropped and a GC forced between them), and the tool asserts
the two manifests are row-identical before writing numbers. Output is
the '## Composition' section of SHUFFLE_BYTES.md (idempotent replace).

Usage: python tools/composition_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_by_example_spark.session import get_spark


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


def executor_totals(spark) -> tuple:
    ex = spark._jsparkSession.sparkContext().statusStore().executorList(
        False
    )
    return (
        sum(ex.apply(i).totalShuffleWrite() for i in range(ex.size())),
        sum(ex.apply(i).totalInputBytes() for i in range(ex.size())),
    )


def quiesce(spark) -> None:
    """Drop every pinned block and force a GC so neither variant
    inherits the other's cache, and async listener updates settle."""
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    spark._jvm.System.gc()
    time.sleep(1)


def run_chain(spark, sf_dir):
    """Stage-by-stage: every stage materialized (detach) from its own
    corpus read — no shared persist — then the same selection/packing
    tail over the pinned key frames."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.functions.text import token_count
    from iceberg_by_example_spark.operators.dedup import (
        dedup_cluster_canonical,
        dedup_exact,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        DECON_BENCH_BUCKET,
        _curate_select_pack,
        _funnel_metrics,
        _funnel_pass,
        pipeline_decontaminate,
        pipeline_quality_score,
    )
    from iceberg_by_example_spark.operators.sampling import hash_bucket
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.util import detach

    d = load_table(spark, sf_dir, "documents")
    heur = detach(
        _funnel_metrics(d).filter(_funnel_pass()).select("doc_id")
    )
    exact = detach(dedup_exact(spark, sf_dir).select("doc_id"))
    losers = detach(
        dedup_cluster_canonical(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    bench_slice = detach(
        d.select("doc_id").filter(
            hash_bucket(F.col("doc_id"), "bench") < DECON_BENCH_BUCKET
        )
    )
    contaminated = detach(
        pipeline_decontaminate(spark, sf_dir)
        .filter("contaminated")
        .select("doc_id")
    )
    lr_keep = detach(
        pipeline_quality_score(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    surv = (
        d.select("doc_id", "source", token_count("text").alias("n_tokens"))
        .join(heur, "doc_id", "left_semi")
        .join(exact, "doc_id", "left_semi")
        .join(losers, "doc_id", "left_anti")
        .join(bench_slice, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .join(lr_keep, "doc_id", "left_semi")
    )
    return _curate_select_pack(surv)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("composition-report")
    corpus_mb = os.path.getsize(
        os.path.join(sf_dir, "documents.parquet")
    ) / 1_048_576

    def measure(fn):
        quiesce(spark)
        time.sleep(1)  # async listener flush before the baseline
        b0 = fs_bytes_read(spark)
        s0, i0 = executor_totals(spark)
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
        time.sleep(1)  # async listener flush
        s1, i1 = executor_totals(spark)
        return (rows, fs_bytes_read(spark) - b0, s1 - s0, i1 - i0, sec)

    # calibrate the footer/dictionary footprint of ONE fresh corpus
    # scan (uncached: quiesce() just dropped every pinned block)
    from pyspark.sql import functions as F

    quiesce(spark)
    cal0 = fs_bytes_read(spark)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).agg(
        F.sum(F.length("text"))
    ).collect()
    scan_kb = max(fs_bytes_read(spark) - cal0, 1)

    chain_rows, chain_fs, chain_sh, chain_in, chain_sec = measure(
        run_chain
    )

    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_corpus,
    )

    comp_rows, comp_fs, comp_sh, comp_in, comp_sec = measure(
        pipeline_curate_corpus
    )
    assert sorted(map(tuple, comp_rows)) == sorted(
        map(tuple, chain_rows)
    ), "composed manifest != stage-by-stage manifest"

    # r13 VERDICT #6: measure the disk-backed-cache and the
    # written-manifest variants against the same equality bar — the
    # structure must hold (and cost about the same) when the pins
    # live on disk, the regime a 100 TB cache actually runs in.
    disk_rows, disk_fs, disk_sh, disk_in, disk_sec = measure(
        lambda s, d: pipeline_curate_corpus(s, d, materialize="disk")
    )
    assert sorted(map(tuple, disk_rows)) == sorted(
        map(tuple, comp_rows)
    ), "disk-persist manifest != in-memory manifest"
    man_rows, man_fs, man_sh, man_in, man_sec = measure(
        lambda s, d: pipeline_curate_corpus(s, d, materialize="manifest")
    )
    assert sorted(map(tuple, man_rows)) == sorted(
        map(tuple, comp_rows)
    ), "written-manifest manifest != in-memory manifest"
    del disk_in, man_in

    del chain_in, comp_in  # see docstring: not a discriminator
    mb = lambda b: b / 1_048_576  # noqa: E731
    kb = lambda b: b / 1024  # noqa: E731
    section = [
        "## Composition — the end-to-end curation pipeline (sf0.1)",
        "",
        "Generated by `tools/composition_report.py`: the composed",
        "`pipeline_curate_corpus` (funnel -> exact dedup -> near-dup",
        "clusters -> decontaminate -> learned LR filter -> temperature",
        "quotas -> global shuffle -> per-shard packing) versus the same",
        "stages materialized one job at a time; the tool asserts both",
        "variants return the IDENTICAL pack manifest before reporting.",
        "",
        "How to read `~scan execs` (measured quirk of this Spark",
        "build, see the tool docstring): the vectorized reader's data",
        "pages bypass the byte counters, but each scan execution's",
        "footer/dictionary reads hit the Hadoop-FS counter — the",
        "column divides that delta by the footprint of one calibrated",
        "fresh corpus scan, giving 'how many times was the corpus",
        "parquet opened/decoded', planning reads included. Measured",
        "over the WHOLE run, pre-pin stages included.",
        "",
        "| job | footer KB | ~scan execs | shuffle MB | sec |",
        "|---|---|---|---|---|",
        f"| composed pipeline_curate_corpus | {kb(comp_fs):.0f} |"
        f" {comp_fs / scan_kb:.1f} |"
        f" {mb(comp_sh):.2f} | {comp_sec:.1f} |",
        f"| composed, materialize='disk' (DISK_ONLY pins) |"
        f" {kb(disk_fs):.0f} |"
        f" {disk_fs / scan_kb:.1f} |"
        f" {mb(disk_sh):.2f} | {disk_sec:.1f} |",
        f"| composed, materialize='manifest' (parquet boundary) |"
        f" {kb(man_fs):.0f} |"
        f" {man_fs / scan_kb:.1f} |"
        f" {mb(man_sh):.2f} | {man_sec:.1f} |",
        f"| stage-by-stage chain | {kb(chain_fs):.0f} |"
        f" {chain_fs / scan_kb:.1f} |"
        f" {mb(chain_sh):.2f} | {chain_sec:.1f} |",
        "",
        "The disk/manifest rows are the r14 executable form of the"
        " 'cache backed by disk' claim: identical manifests"
        " (tool-asserted), same key-width shuffles, wall-clock within"
        " the same band — the composition does not depend on the pins"
        " living in memory. (The manifest row's footer KB includes"
        " writing+reading the survivor parquet, its macro-stage"
        " boundary.)",
        "",
        f"`documents.parquet` at this sf is {corpus_mb:.1f} MB"
        f" compressed; one calibrated fresh scan costs {scan_kb/1024:.1f}"
        " KB of footer reads. The composed job pins the corpus"
        " relation once; every stage's internal load_table"
        " canonicalizes to the same plan, so the CacheManager serves"
        " each stage scan from the pinned relation and parquet is"
        " decoded once (the residual scan execs are per-stage"
        " PLANNING footer reads, which both variants pay equally) —"
        " the chain re-opens and re-decodes parquet per stage, and"
        " the wall-clock gap is that re-decoded tokenize/shingle"
        " work. Shuffle bytes are key-width and EQUAL in both shapes"
        " (the stages exchange doc_id digests/flags, never text) —"
        " sharing scans does not move any exchange from keys to"
        " payloads.",
        "",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SHUFFLE_BYTES.md",
    )
    text = open(out).read()
    pat = re.compile(
        r"\n## Composition — the end-to-end curation pipeline.*\Z",
        re.S,
    )
    text = pat.sub("\n", text).rstrip("\n") + "\n\n"
    with open(out, "w") as f:
        f.write(text + "\n".join(section).rstrip() + "\n")
    print("\n".join(section))
    spark.stop()


if __name__ == "__main__":
    main()
