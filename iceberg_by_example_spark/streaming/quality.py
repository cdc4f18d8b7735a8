"""Online application of the batch-trained quality filter.

The deployment pattern every learned curation filter follows: the
classifier TRAINS offline (``pipeline_quality_lr_step`` — two
full-batch GD passes over the corpus), the keep threshold is TUNED
offline on the batch score distribution (``pipeline_quality_score``'s
exact histogram quantile), and the stream applies both as constants —
a stateless per-row map, no aggregation state, no watermark, exactly
the shape that keeps an ingest filter at line rate on any cluster.

Cross-engine/batch-stream consistency: the scoring expression is the
SAME ROUND-once fixed-point sigmoid the batch operator uses (imported,
not copied), so a document scores bit-identically whether it arrives
in the nightly batch or on the stream; pytest pins stream output ==
batch operator output per doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_by_example_spark.operators.pipeline import (
    _lr_sigmoid_micro,
)


def batch_trained_filter(spark, sf_dir: str) -> tuple:
    """Train offline and extract the deployable constants: the DIM-row
    weight frame (collected to a plain list — it is feature-width,
    never corpus-width) and the exact keep cutoff the batch quantile
    gate selected. Returns (w2 list[int], keep_micro int)."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_quality_lr_step,
        pipeline_quality_score,
    )

    w = pipeline_quality_lr_step(spark, sf_dir)
    w2 = [
        r["w2_micro"]
        for r in w.orderBy("bucket").collect()
    ]
    scored = pipeline_quality_score(spark, sf_dir, weights=w)
    cutoff = (
        scored.filter(F.col("keep") == 1)
        .agg(F.min("p_micro").alias("q"))
        .collect()[0]["q"]
    )
    return w2, int(cutoff)


def score_doc_stream(
    docs: DataFrame, w2: list, keep_micro: int
) -> DataFrame:
    """(doc_id, p_micro, keep) over a STREAMING documents frame: the
    trained weights land as an array literal (feature-width — no
    stream-static join, no broadcast needed), the logit comes from
    ``hashing_logit_micro`` (the direct w·x fold over the SAME token→
    bucket mapping the trainer's ``hashing_feature_frame`` uses —
    identical int64 by distributivity, pinned equal by pytest; r20
    measured the count-vector form spending ~1s of per-call driver
    expression construction plus DIM×tokens per-row comparisons just
    to dot the vector away), and the score is the batch operator's
    exact fixed-point sigmoid. Stateless: works under any trigger
    with no state store."""
    from iceberg_by_example_spark.operators.text import (
        hashing_logit_micro,
    )

    p = _lr_sigmoid_micro(F.col("z"))
    return (
        hashing_logit_micro(docs, w2)
        .select(
            "doc_id",
            p.alias("p_micro"),
        )
        .select(
            "doc_id",
            "p_micro",
            (F.col("p_micro") >= F.lit(int(keep_micro)))
            .cast("long")
            .alias("keep"),
        )
    )
