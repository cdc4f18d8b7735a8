"""Systematic int64-overflow headroom stress for every fixed-point
operator (r10 VERDICT task #4).

The BM25 and DSIR cliffs were found by REVIEW (r9 ADVICE), not by a
test; this module makes the audit mechanical. Every operator whose
score/key/counter is exact integer (or decimal) arithmetic gets driven
with synthetic trillion-scale constants — the corpus statistics a
real 100 TB deployment would produce — under ``spark.sql.ansi.enabled
= true``, where any int64 overflow is a hard error instead of a
silent wrap. Each case also asserts the value lands inside the
envelope SCALING.md ("Integer-overflow headroom") documents, so the
test doubles as an executable copy of that section.

Covered surfaces (one test per arithmetic path):
- BM25 128-bit term (text.py _BM25_TERM_SPARK) at 400T corpus tokens
- DSIR log-ratio double-cast factors at trillion-token totals
- DSIR Gumbel key: the u→1.0 clamp edge AND the weight+noise addition
  at max plausible |weight|
- RRF integer contributions at pathological rank values
- MinHash affine permutation products at max coefficient × max hash
- Temperature-mix pow_q DECIMAL(38,0) sums at int64-max token counts,
  alpha = 1.0 (the worst exponent), plus the zero-token source contract
- Portable-HLL register sum at the all-buckets-max worst case (the
  2^61 invariant: sum <= 2^(61-p) * 2^p regardless of p)
- CMS cell-wise shard merge near the int64 edge
- LM-perplexity per-trigram NLL at trillion-count contexts and the
  billion-trigram document sum (r12)
- LR gradient accumulator at the one-bucket token cliff, the scoring
  dot product at max-plausible micro weights × a billion-token doc,
  and the sigmoid's exact saturation at double-overflow logits (r13)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ansi(spark):
    """ANSI mode on for the test body: overflow becomes an error."""
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_bm25_term_400T_tokens(ansi):
    """The 128-bit term at a 400T-token / 0.4T-doc corpus — the exact
    statistics where the old int64 numerator (BM25_SCALE*22*D*tf)
    wrapped. DECIMAL(38,0) num < 1e38 and the outer (N-df)*quotient
    stays int64 (quotient <= 2.2e6 by construction)."""
    from iceberg_by_example_spark.operators.text import (
        BM25_SCALE,
        _BM25_TERM_SPARK,
    )

    df = ansi.createDataFrame(
        [(400_000_000_000, 400_000_000_000_000, 1_000_000, 100_000, 7)],
        "n_docs long, d_tokens long, tf long, dl long, df long",
    )
    r = _one(df.select(F.expr(_BM25_TERM_SPARK).alias("term")))
    assert r["term"] > 0
    # quotient bound => outer product bound (documented envelope)
    assert r["term"] <= (400_000_000_000 - 7) * 22 * BM25_SCALE // 10


def test_dsir_log_ratio_trillion_totals(ansi):
    """(tc+1)*(raw_tot+B) at trillion-token totals: the double-cast
    factors keep the ratio finite where the int64 product wrapped."""
    from iceberg_by_example_spark.operators.sampling import (
        DSIR_BUCKETS,
        DSIR_LOG_SCALE,
    )

    df = ansi.createDataFrame(
        [(4_000_000_000_000, 4_000_000_000_000, 1_000_000_000_000,
          3_000_000_000_000)],
        "tc long, rc long, tgt_tot long, raw_tot long",
    )
    lw = F.round(
        F.lit(DSIR_LOG_SCALE)
        * F.ln(
            (F.col("tc") + 1).cast("double")
            * (F.col("raw_tot") + DSIR_BUCKETS).cast("double")
            / (
                (F.col("rc") + 1).cast("double")
                * (F.col("tgt_tot") + DSIR_BUCKETS).cast("double")
            )
        )
    ).cast("long")
    r = _one(df.select(lw.alias("lw")))
    # ln(ratio) here = ln(3) — the fixed point is small and exact
    assert abs(r["lw"] - round(DSIR_LOG_SCALE * math.log(3))) <= 1


def test_gumbel_key_edge_and_envelope(ansi):
    """Two cliffs at once: (a) the u==1.0 edge — a 60-bit hash within
    ~64 of 2^60 casts to exactly 2^60 as double; without the clamp
    -ln(-ln(1.0)) is +Inf and the key addition overflows — and (b) the
    weight+noise addition at the documented max |noise| (~3.7e7 at
    DSIR_LOG_SCALE=1e6) against a weight parked near int64 max."""
    from iceberg_by_example_spark.operators.sampling import (
        DSIR_LOG_SCALE,
        _gumbel_uniform_from_hash,
    )

    big_weight = (1 << 63) - 1 - 50_000_000
    df = ansi.createDataFrame(
        [((1 << 60) - 32, big_weight), (0, big_weight),
         (1 << 59, -big_weight)],
        "h long, w long",
    )
    u = _gumbel_uniform_from_hash(F.col("h"))
    gq = F.round(F.lit(DSIR_LOG_SCALE) * -F.ln(-F.ln(u))).cast("long")
    rows = df.select(
        gq.alias("gq"), (F.col("w") + gq).alias("key")
    ).collect()
    for r in rows:
        # noise envelope: -ln(ln(2^60)) * 1e6 .. -ln(2^-53)-ish * 1e6
        assert -4_000_000 <= r["gq"] <= 37_000_000
        assert r["key"] is not None  # the addition completed under ANSI
    # the clamp fired on the edge hash: finite, at the ceiling value
    edge_gq = rows[0]["gq"]
    expect = round(DSIR_LOG_SCALE * -math.log(-math.log(1.0 - 2.0**-53)))
    assert edge_gq == expect


def test_rrf_contrib_pathological_ranks(ansi):
    """RRF_SCALE div (K0 + rank) at rank 1 and at absurd rank values:
    the division shrinks, never grows — the fused sum over any number
    of rankers is bounded by n_rankers * RRF_SCALE / (K0+1)."""
    from iceberg_by_example_spark.operators.similarity import (
        RRF_K0,
        RRF_SCALE,
    )

    df = ansi.createDataFrame(
        [(1,), (50,), ((1 << 62),)], "rk long"
    )
    c = F.expr(f"CAST({RRF_SCALE} AS BIGINT) div ({RRF_K0} + rk)")
    rows = df.select(c.alias("c")).collect()
    assert rows[0]["c"] == RRF_SCALE // (RRF_K0 + 1)
    assert rows[2]["c"] == 0
    # 10k fused rankers at best rank still fit comfortably
    assert 10_000 * rows[0]["c"] < (1 << 63) - 1


def test_minhash_affine_product_max(ansi):
    """a*h+b at the max permutation coefficient × max 31-bit hash:
    63 * (2^31-1) + b < 2^38 — five orders below the cliff."""
    from iceberg_by_example_spark.operators.dedup import (
        MINHASH_PERMS,
        _PRIME31,
        _perm_coeffs,
    )

    h_max = _PRIME31 - 1
    df = ansi.createDataFrame([(h_max,)], "h long")
    for i in (0, MINHASH_PERMS - 1):
        a, b = _perm_coeffs(i)
        r = _one(
            df.select(((F.lit(a) * F.col("h") + F.lit(b)) % _PRIME31)
                      .alias("p"))
        )
        assert 0 <= r["p"] < _PRIME31
        assert a * h_max + b < 1 << 63  # the pre-mod product itself


def test_temperature_mix_int64_max_tokens_and_zero_source(ansi):
    """pow_q sums at alpha=1.0 (the worst exponent) on sources parked
    at int64-scale token counts: the DECIMAL(38,0) path absorbs what
    the old long cast wrapped on (1e6 * 9.2e18 = 9.2e24 needs 85
    bits). And the r10 ADVICE #2 contract: a ZERO-token source keeps
    share 0 / boost NULL instead of vanishing from the mix."""
    from iceberg_by_example_spark.operators.sampling import (
        temperature_mix_rates,
    )

    per_source = ansi.createDataFrame(
        [("big", 9_200_000_000_000_000_000), ("small", 1_000),
         ("empty", 0)],
        "source string, source_tokens long",
    )
    rows = {
        r["source"]: r
        for r in temperature_mix_rates(per_source, alpha=1.0).collect()
    }
    assert rows["empty"]["temp_share"] == 0.0
    assert rows["empty"]["boost"] is None
    assert rows["big"]["temp_share"] > 0.999999
    total = sum(r["temp_share"] for r in rows.values())
    assert abs(total - 1.0) < 1e-12


def test_hll_register_sum_all_max(ansi):
    """The register-sum invariant: rho0 = 61-p, so the max term is
    2^(60-p) and the sum over all 2^p buckets at the min register r=1
    is 2^(60-p)*2^p = 2^60 — inside int64 for EVERY p, so raising
    precision at scale can never overflow the estimator."""
    from iceberg_by_example_spark.plans.reshape import (
        HLL_M,
        _HLL_RHO0,
        portable_hll_estimate,
    )

    regs = ansi.range(HLL_M).select(
        F.lit("g").alias("g"),
        F.col("id").alias("bucket"),
        F.lit(1).alias("r"),
    )
    r = _one(portable_hll_estimate(regs, ["g"]))
    assert r["approx"] > 0 and math.isfinite(r["approx"])
    assert HLL_M * (1 << (_HLL_RHO0 - 1)) == 1 << 60


def test_lm_nll_trillion_scale_doc_sum(ansi):
    """The LM-perplexity fixed point at production-corpus statistics:
    an unseen (context, word) inside a context seen 1e12 times against
    a 1e9-word vocabulary is the WORST per-trigram NLL — about
    ln(1e12 + 1e9)·1e6 ≈ 2.77e7 — and a billion-trigram document's
    exact int64 sum of it stays ~2.8e16, three decimal orders inside
    the cliff. Drives the operator's own expression under ANSI."""
    from iceberg_by_example_spark.operators.text import (
        LM_NLL_SCALE,
        _nll_micro,
    )

    df = ansi.createDataFrame(
        [(0, 10**12, 10**9)], "cnt3 long, cnt2 long, v long"
    )
    r = _one(
        df.select(
            _nll_micro(F.col("cnt3"), F.col("cnt2"), F.col("v")).alias(
                "nll"
            )
        )
    )
    want = -math.log(1.0 / (10**12 + 10**9)) * LM_NLL_SCALE
    assert abs(r["nll"] - want) <= 1
    assert r["nll"] < 28_000_000
    s = _one(
        ansi.range(1).select(
            (
                F.lit(r["nll"]).cast("long")
                * F.lit(1_000_000_000).cast("long")
            ).alias("s")
        )
    )
    assert s["s"] == r["nll"] * 1_000_000_000  # exact, no ANSI error


def test_lr_gradient_and_sigmoid_envelopes(ansi):
    """The LR trainer/scorer fixed point at production statistics
    (r12 VERDICT task: the two newest quantizations join this suite).
    (a) The per-bucket gradient SUM(r·cnt) — |r| ≤ LR_SCALE after the
    step-2 sigmoid — holds int64 up to ~9.2e12 corpus tokens landing
    in ONE bucket (a ~590T-token corpus at HASHING_DIM=64 uniform;
    past that, widen the SUM to DECIMAL(38,0)): planted rows summing
    to 9.2e18 evaluate without ANSI error. (b) The scoring dot
    product at max-plausible micro weights (|w2| ≤ 1.5·LR_SCALE·
    L_avg/DIM ≈ 2.3e5 at 1e4-token average docs) over a pathological
    billion-token document stays int64, element products included.
    (c) The ROUND-once sigmoid saturates gracefully to exactly
    LR_SCALE / 0 at double-overflow logits — never NaN, never an
    ANSI error."""
    from iceberg_by_example_spark.operators.pipeline import (
        LR_SCALE,
        _lr_dot_micro,
        _lr_sigmoid_micro,
    )
    from iceberg_by_example_spark.operators.text import HASHING_DIM

    # (a) gradient accumulator at the documented one-bucket cliff
    rows = [(LR_SCALE, 920_000_000_000)] * 10  # r·cnt sums to 9.2e18
    g = _one(
        ansi.createDataFrame(rows, "r long, cnt long").agg(
            F.sum(F.col("r") * F.col("cnt")).alias("g")
        )
    )
    assert g["g"] == 9_200_000_000_000_000_000  # < 2^63-1, exact

    # (b)+(c) scoring dot at max-plausible weights over a 1e9-token
    # doc concentrated evenly across buckets, both signs
    w_max = int(1.5 * LR_SCALE * 10_000) // HASHING_DIM  # ≈ 2.3e5
    f_each = 10**9 // HASHING_DIM
    for sign in (1, -1):
        df = ansi.createDataFrame(
            [([sign * w_max] * HASHING_DIM, [f_each] * HASHING_DIM)],
            "w array<long>, features array<long>",
        )
        r = _one(
            df.select(
                _lr_dot_micro().alias("z"),
                _lr_sigmoid_micro(_lr_dot_micro()).alias("p"),
            )
        )
        assert r["z"] == sign * w_max * f_each * HASHING_DIM
        assert abs(r["z"]) < 2**62  # documented envelope, headroom 2x
        # |z|/LR_SCALE ≈ 2.3e11 >> 709: exp over/underflows the
        # double, and the quantized sigmoid must saturate exactly
        assert r["p"] == (LR_SCALE if sign > 0 else 0)


def test_curate_quota_decimal_envelope(ansi):
    """The curation pipeline's per-source quota ``(pow_q * target)
    div pow_tot`` runs in DECIMAL(38,0): at int64-max statistics
    (pow_q = 1e6·(2^63)^0.3 ≈ 4.9e11 from the temperature fixed
    point, target ≈ 9.2e18 surviving docs) the product is ~4.5e30 —
    seven decimal orders inside 38 digits — and the integral quotient
    is exact, int64-fitting, and equal to Python's big-int
    arithmetic."""
    from iceberg_by_example_spark.operators.pipeline import (
        MIX_DOC_BUDGET_DEN,
    )

    pow_q = 490_000_000_000
    pow_tot = 3 * pow_q
    n_surv = 9_200_000_000_000_000_000
    df = ansi.range(1).select(
        F.lit(pow_q).cast("decimal(38,0)").alias("pow_q"),
        F.lit(pow_tot).cast("decimal(38,0)").alias("pow_tot"),
        F.lit(n_surv).alias("n_surv"),
    )
    target = (
        f"((n_surv + {MIX_DOC_BUDGET_DEN - 1})"
        f" div {MIX_DOC_BUDGET_DEN})"
    )
    r = _one(
        df.select(
            F.expr(
                f"CAST((pow_q * {target}) div pow_tot AS BIGINT)"
            ).alias("q")
        )
    )
    want = (
        pow_q
        * ((n_surv + MIX_DOC_BUDGET_DEN - 1) // MIX_DOC_BUDGET_DEN)
        // pow_tot
    )
    assert r["q"] == want
    # r14 largest-remainder seats: the seat rank key is the SAME
    # decimal product's modulus — bounded by pow_tot (~1.5e12 at these
    # int64-max statistics), so the BIGINT cast is exact; ANSI proves
    # no silent wrap anywhere in the product/mod chain.
    r2 = _one(
        df.select(
            F.expr(
                f"CAST((pow_q * {target}) % pow_tot AS BIGINT)"
            ).alias("rem")
        )
    )
    want_rem = (
        pow_q
        * ((n_surv + MIX_DOC_BUDGET_DEN - 1) // MIX_DOC_BUDGET_DEN)
        % pow_tot
    )
    assert r2["rem"] == want_rem
    assert 0 <= r2["rem"] < pow_tot


def test_cms_shard_merge_near_edge(ansi):
    """CMS cells merge by addition across shards; 1000 shards each
    carrying 9e15 instances of one hot cell sum to 9e18 — still under
    int64, and the ANSI sum proves it exact."""
    df = ansi.range(1000).select(
        F.lit("ab").alias("bucket"),
        F.lit(9_000_000_000_000_000).alias("cnt"),
    )
    r = _one(df.groupBy("bucket").agg(F.sum("cnt").alias("total")))
    assert r["total"] == 9_000_000_000_000_000 * 1000
