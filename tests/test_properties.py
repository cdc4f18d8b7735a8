"""Property-based and negative-path tests.

The hypothesis test models MERGE as a dict-upsert and checks the
distributed implementation against it on arbitrary small inputs —
the correctness story the 50-row golden fixture can't give alone.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_by_example_spark.tables.versioned import VersionedTable

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=-100, max_value=100)


rows_strategy = st.lists(
    st.tuples(KEYS, VALS), min_size=0, max_size=12, unique_by=lambda r: r[0]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=rows_strategy, source=rows_strategy)
def test_merge_equals_dict_upsert(spark, tmp_path_factory, target, source):
    """merge(target, source) ≡ {**dict(target), **dict(source)}."""
    loc = str(tmp_path_factory.mktemp("prop") / "t")
    t = VersionedTable.create(spark, loc, schema="k bigint, v bigint")
    try:
        if target:
            t.append(spark.createDataFrame(target, "k bigint, v bigint"))
        src_df = spark.createDataFrame(source or [(None, None)], "k bigint, v bigint")
        if source:
            t.merge(src_df, on="k")
        got = {r["k"]: r["v"] for r in t.read().collect()}
        want = {**dict(target), **dict(source)}
        assert got == want
    finally:
        t.drop()


def test_read_unknown_branch_raises(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema="k bigint")
    with pytest.raises(ValueError, match="unknown ref"):
        t.read(branch="nope")


def test_drop_main_branch_rejected(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t2"), schema="k bigint")
    with pytest.raises(ValueError, match="cannot drop main"):
        t.drop_branch("main")


def test_create_existing_table_rejected(spark, tmp_path):
    loc = str(tmp_path / "t3")
    VersionedTable.create(spark, loc, schema="k bigint")
    with pytest.raises(ValueError, match="already exists"):
        VersionedTable.create(spark, loc, schema="k bigint")
    # if_not_exists is the reference's CREATE-if-absent idiom (WI:23)
    VersionedTable.create(spark, loc, schema="k bigint", if_not_exists=True)


def test_load_missing_table_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="no table"):
        VersionedTable.load(spark, str(tmp_path / "missing"))


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    """Iceberg MERGE cardinality rule: duplicate source keys error out."""
    t = VersionedTable.create(spark, str(tmp_path / "dupm"), schema="k bigint, v bigint")
    t.append(spark.createDataFrame([(1, 10)], "k bigint, v bigint"))
    dup_src = spark.createDataFrame([(1, 11), (1, 12)], "k bigint, v bigint")
    with pytest.raises(ValueError, match="duplicate key"):
        t.merge(dup_src, on="k")
    # escape hatch keeps last-writer-ambiguous behavior opt-in
    t.merge(dup_src.dropDuplicates(["k"]), on="k")
    assert t.read().count() == 1


# -- CoW ≡ MoR equivalence under arbitrary mutation sequences ---------------

OPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), rows_strategy.filter(len)),
        st.tuples(st.just("delete"), KEYS),
        st.tuples(st.just("update"), KEYS, VALS),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(initial=rows_strategy, ops=OPS)
def test_cow_and_mor_states_identical(spark, tmp_path_factory, initial, ops):
    """The write mode is a physical-layout choice, never a semantics
    choice: any sequence of merge/delete/update applied to a
    copy-on-write table and to a merge-on-read table must read back
    identically (and match a driver-side dict model)."""
    base = tmp_path_factory.mktemp("modes")
    model = dict(initial)
    tables = {}
    for mode in ("copy-on-write", "merge-on-read"):
        props = {f"write.{op}.mode": mode for op in ("delete", "update", "merge")}
        t = VersionedTable.create(
            spark, str(base / mode), schema="k bigint, v bigint", properties=props
        )
        if initial:
            t.append(spark.createDataFrame(initial, "k bigint, v bigint"))
        tables[mode] = t
    try:
        for op in ops:
            if op[0] == "merge":
                src = op[1]
                model.update(dict(src))
                for t in tables.values():
                    t.merge(
                        spark.createDataFrame(src, "k bigint, v bigint"), on="k"
                    )
            elif op[0] == "delete":
                k = op[1]
                model.pop(k, None)
                for t in tables.values():
                    t.delete(f"k = {k}")
            else:
                _, k, v = op
                if k in model:
                    model[k] = v
                for t in tables.values():
                    t.update(f"k = {k}", {"v": f"CAST({v} AS BIGINT)"})
        states = {
            mode: {r["k"]: r["v"] for r in t.read().collect()}
            for mode, t in tables.items()
        }
        assert states["copy-on-write"] == states["merge-on-read"] == model
    finally:
        for t in tables.values():
            t.drop()


# Small token vocabulary forces heavy shingle sharing, exercising the
# inverted index, the join-count intersection math, and (with the tiny
# df_cap below) the hot-shingle correction path together.
_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
docs_strategy = st.lists(
    st.lists(
        st.sampled_from(_WORDS), min_size=3, max_size=8
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, df_cap=st.sampled_from([2, 3, 10**6]))
def test_ngram_jaccard_matches_bruteforce(
    spark, tmp_path_factory, docs, df_cap
):
    """The inverted-index count-based Jaccard (with hot-shingle
    correction) must equal the O(n²) set-based definition for every
    candidate pair it emits — and emit every pair that shares at least
    one UNCAPPED shingle (pairs linked only through hot shingles are
    the documented recall trade)."""
    import os

    from iceberg_by_example_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    sf_dir = str(tmp_path_factory.mktemp("njp"))
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    def shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sets = {i: shingles(t) for i, t in enumerate(rows_toks(docs))}
    # document frequency per shingle → the capped vocabulary
    df = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    hot = {g for g, n in df.items() if n > df_cap}

    expected = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = sets[a] & sets[b]
            if not (inter - hot):
                continue  # candidate only via hot shingles → not emitted
            jac = len(inter) / len(sets[a] | sets[b])
            if jac >= 0.08:
                expected[(a, b)] = jac

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, sf_dir, df_cap=df_cap).collect()
    }
    assert set(got) == set(expected), (set(got), set(expected))
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-12, (k, got[k], expected[k])


def rows_toks(docs):
    return list(docs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_containment_guaranteed_recall_region(
    spark, tmp_path_factory, docs
):
    """The probe-bounded containment operator must report EVERY
    ≥0.8-containment pair whose smaller side has ≤ CONTAINMENT_RAREST_B
    shingles (such a doc probes with its whole shingle set, so the
    least(CAP, ⌈0.8·min_n⌉) hit floor is met by construction — the
    recall guarantee the constants' comment proves). With this
    strategy's 3-8-token docs every doc is inside the region, so here
    the bounded operator must equal brute force exactly — values
    included."""
    import math
    import os

    from iceberg_by_example_spark.operators.dedup import dedup_containment

    sf_dir = str(tmp_path_factory.mktemp("cont"))
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    def shingles(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(docs) if len(t) >= 3}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                c = len(sets[a] & sets[b]) / min(len(sets[a]), len(sets[b]))
                if c >= 0.8:
                    want[(a, b)] = c
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup_containment(spark, sf_dir).collect()
    }
    assert got.keys() == want.keys()
    for pair, c in want.items():
        assert math.isclose(got[pair], c)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_codec_roundtrip_property(w, h, seed):
    """encode→decode is the identity on dims and the exact-integer
    mean for ANY size — including the padding cases (w mod 4 ≠ 0)
    hypothesis will find."""
    import numpy as np

    from iceberg_by_example_spark.operators import multimodal as mm

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = mm._decode_bmp(mm._encode_bmp(arr))
    assert got is not None
    gw, gh, gc, gmean = got
    assert (gw, gh, gc) == (w, h, 3)
    assert gmean == float(int(arr.sum(dtype="uint64"))) / (w * h * 3)


@given(
    n=st.integers(min_value=1, max_value=5000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_codec_roundtrip_property(n, seed):
    """encode→decode returns the exact sample array for any length,
    including odd byte counts that exercise RIFF word alignment."""
    import numpy as np

    from iceberg_by_example_spark.operators import multimodal as mm

    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=n).astype("<i2")
    rate, got = mm._decode_wav(mm._encode_wav(s))
    assert rate == mm._AUDIO_RATE
    assert np.array_equal(got, s)


TS0 = 1_700_000_000  # epoch base for generated event times


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=500),  # t offset (sec)
        ),
        min_size=1,
        max_size=10,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_asof_join_equals_bruteforce_property(spark, lefts, rights):
    """asof_join(direction=backward|forward) ≡ the per-row brute-force
    argmin/argmax on arbitrary small inputs, including duplicate
    timestamps (ties resolve to the greatest tiebreak id) and keys
    with no match (NULL carry)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from iceberg_by_example_spark.operators.joins import asof_join

    mk_ts = lambda off: dt.datetime.utcfromtimestamp(TS0 + off)
    left_rows = [
        (i, k, mk_ts(off)) for i, (k, off) in enumerate(lefts)
    ]
    right_rows = [
        (100 + i, k, mk_ts(off)) for i, (k, off) in enumerate(rights)
    ]
    left = spark.createDataFrame(
        left_rows, "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "rid long, k long, ts timestamp"
    )
    if not right_rows:
        right = right.filter(F.col("rid").isNotNull())
    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left,
                right,
                on="k",
                time_col="ts",
                carry_cols=["rid"],
                right_time_alias="rts",
                tiebreak_cols=["rid"],
                direction=direction,
            ).collect()
        }
        for lid, k, ts in left_rows:
            if direction == "backward":
                cands = [
                    (rts, rid)
                    for rid, rk, rts in right_rows
                    if rk == k and rts <= ts
                ]
                want = max(cands)[1] if cands else None
            else:
                cands = [
                    (rts, -rid)
                    for rid, rk, rts in right_rows
                    if rk == k and rts >= ts
                ]
                want = -min(cands)[1] if cands else None
            assert got[lid] == want, (direction, lid, got[lid], want)


# Four 8-token phrases; docs concatenate 0-6 of them, so 15-token
# windows frequently recur across docs and WITHIN docs (repeated
# phrase ids) — the regimes the planted-corpus test can't sweep.
_PHRASES = [[f"p{i}w{j}" for j in range(8)] for i in range(4)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=6),
        min_size=1,
        max_size=5,
    )
)
def test_exact_substring_equals_bruteforce(spark, tmp_path_factory, docs):
    """dedup_exact_substring ≡ per-position brute force: window
    counts, keep-first dup flags (global (doc_id, pos) order), and
    gaps-and-islands longest-run chaining on arbitrary phrase-composed
    corpora."""
    from iceberg_by_example_spark.operators.dedup import (
        SUB_TOKENS,
        dedup_exact_substring,
    )

    toks = {
        i: [t for pid in ph for t in _PHRASES[pid]]
        for i, ph in enumerate(docs)
    }
    rows = [(i, " ".join(ts)) for i, ts in toks.items()]
    loc = tmp_path_factory.mktemp("substr")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{loc}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup"], r["longest_dup_run"])
        for r in dedup_exact_substring(spark, str(loc)).collect()
    }
    # brute force
    first: dict[tuple, tuple] = {}
    wins: dict[int, list[tuple]] = {}
    for i in sorted(toks):
        ts = toks[i]
        wins[i] = [
            tuple(ts[p : p + SUB_TOKENS])
            for p in range(len(ts) - SUB_TOKENS + 1)
        ]
        for p, w in enumerate(wins[i]):
            first.setdefault(w, (i, p))
    for i, ts in toks.items():
        if len(ts) < SUB_TOKENS:
            assert i not in got  # filtered out, as the operator documents
            continue
        dup = [first[w] != (i, p) for p, w in enumerate(wins[i])]
        n_dup = sum(dup)
        longest = run = 0
        for flag in dup:
            run = run + 1 if flag else 0
            longest = max(longest, run)
        want = (
            len(wins[i]),
            n_dup,
            longest + SUB_TOKENS - 1 if longest else 0,
        )
        assert got[i] == want, (i, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    run_len=st.integers(min_value=29, max_value=40),
    off_a=st.integers(min_value=0, max_value=25),
    off_b=st.integers(min_value=0, max_value=25),
    fill_a=st.integers(min_value=30, max_value=50),
    fill_b=st.integers(min_value=30, max_value=50),
)
def test_winnow_guarantee_vs_strided_alignment_property(
    spark, run_len, off_a, off_b, fill_a, fill_b
):
    """The Schleimer et al. winnowing theorem, fuzzed: a shared run of
    >= SPAN_TOKENS + WINNOW_W - 1 tokens planted at ARBITRARY offsets
    in two docs is ALWAYS paired by `span_winnow_pairs` — while the
    position-strided `span_pairs` detects it exactly when the two
    offsets are congruent mod SPAN_STRIDE (windows start at absolute
    positions ≡ 0 mod stride, so incongruent copies never sample the
    same in-run window). This pins both the new sampler's guarantee
    and the precise characterization of the old one's gap."""
    from iceberg_by_example_spark.operators.dedup import (
        SPAN_STRIDE,
        span_pairs,
        span_winnow_pairs,
    )

    run = [f"r{i:02d}" for i in range(run_len)]
    ta = [f"a{i:02d}" for i in range(fill_a)]
    tb = [f"b{i:02d}" for i in range(fill_b)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(ta[:off_a] + run + ta[off_a:])),
            (2, " ".join(tb[:off_b] + run + tb[off_b:])),
            (3, " ".join(f"c{i:02d}" for i in range(40))),
            (4, " ".join(f"e{i:02d}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    winnowed = {
        (r["doc_a"], r["doc_b"]) for r in span_winnow_pairs(docs).collect()
    }
    assert winnowed == {(1, 2)}, (run_len, off_a, off_b)
    strided = {(r["doc_a"], r["doc_b"]) for r in span_pairs(docs).collect()}
    if off_a % SPAN_STRIDE == off_b % SPAN_STRIDE:
        assert strided == {(1, 2)}, (run_len, off_a, off_b)
    else:
        assert strided == set(), (run_len, off_a, off_b)


# -- curation state store: random chains equal the Python fold ----------

_FPS = st.sets(st.sampled_from(list("abcdefgh")), max_size=5)
_SRC = st.sampled_from(["s1", "s2"])


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_store_random_chain_equals_python_fold(
    spark, tmp_path_factory, data
):
    """The store's LSM/pointer mechanics against an in-Python model,
    over ARBITRARY delta sequences: N days of random fingerprint /
    postings / mass deltas (later days may omit a relation — the
    carried-pin path), compaction at random points, then every
    committed day's ``read_state`` must equal the model's fold at
    that day — fp = distinct union, postings = concat, census =
    per-key counts over the concat, masses = per-source sums. The
    soak pins one realistic chain; this pins the commit/resolve/
    compact machinery itself on adversarial shapes."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    loc = str(tmp_path_factory.mktemp("storeprop") / "s")
    store = CurateStateStore(spark, loc)

    n_days = data.draw(st.integers(min_value=1, max_value=3), "n_days")
    model_days = []  # per-day cumulative snapshots
    cum = {"fp": set(), "postings": [], "mass": {}, "vocab": set()}
    next_doc = 0

    for i in range(n_days):
        day = f"d{i}"
        first = i == 0
        fps = data.draw(_FPS, f"fps{i}")
        n_post = data.draw(
            st.integers(min_value=1 if first else 0, max_value=4),
            f"npost{i}",
        )
        postings = []
        for _ in range(n_post):
            sh = data.draw(
                st.integers(min_value=0, max_value=3), f"sh{i}"
            )
            postings.append((next_doc, 1, sh))
            next_doc += 1
        masses = {
            s: data.draw(
                st.integers(min_value=1, max_value=50), f"m{i}{s}"
            )
            for s in data.draw(
                st.sets(_SRC, min_size=1 if first else 0), f"srcs{i}"
            )
        }
        # later days may omit a relation entirely → the pointer must
        # carry the previous pin forward
        deltas = {
            "fp_index": (
                spark.createDataFrame(
                    [(f,) for f in sorted(fps)], "fp string"
                )
                if fps or first
                else None
            ),
            "shingle_index": (
                spark.createDataFrame(
                    postings, "doc_id bigint, n_sh bigint, shingle bigint"
                )
                if postings or first
                else None
            ),
            "bench_vocab": (
                spark.createDataFrame([(99,)], "shingle bigint")
                if first
                else None
            ),
            "source_stats": (
                spark.createDataFrame(
                    list(masses.items()),
                    "source string, source_tokens bigint",
                )
                if masses or first
                else None
            ),
        }
        if deltas["shingle_index"] is not None:
            deltas["shingle_census"] = (
                deltas["shingle_index"]
                .groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
            )
        else:
            deltas["shingle_census"] = None
        store._commit(
            day,
            deltas,
            meta={"w2": [0, 0], "keep_micro": 0, "max_doc_id": next_doc},
        )
        cum["fp"] |= fps
        cum["postings"].extend(postings)
        for s, m in masses.items():
            cum["mass"][s] = cum["mass"].get(s, 0) + m
        if first:
            cum["vocab"].add(99)
        model_days.append(
            (day, {k: (set(v) if isinstance(v, set) else
                       list(v) if isinstance(v, list) else dict(v))
                   for k, v in cum.items()})
        )
        if data.draw(st.booleans(), f"compact{i}"):
            store.compact()

    from collections import Counter

    def check(day, want):
        st_state, _meta = store.read_state(
            as_of=day, prefer_mirror=False
        )
        assert {
            r["fp"] for r in st_state.fp_index.collect()
        } == want["fp"], f"fp@{day}"
        got_post = sorted(
            tuple(r) for r in st_state.shingle_index.collect()
        )
        assert got_post == sorted(want["postings"]), f"postings@{day}"
        want_census = Counter(sh for _, _, sh in want["postings"])
        got_census = {
            r["shingle"]: r["df"]
            for r in st_state.shingle_census.collect()
        }
        assert got_census == dict(want_census), f"census@{day}"
        got_mass = {
            r["source"]: r["source_tokens"]
            for r in st_state.source_stats.collect()
        }
        assert got_mass == want["mass"], f"mass@{day}"
        assert {
            r["shingle"] for r in st_state.bench_vocab.collect()
        } == want["vocab"], f"vocab@{day}"

    for day, want in model_days:
        check(day, want)

    # retention phase (r16): expire all but a random tail of the
    # pointer entries, then the retained days must still equal the
    # model EXACTLY, the expired days must fail with the clean
    # day-not-committed error, and the next commit must fold onto the
    # retained base with a never-reused seq.
    entries = store.days()
    k = data.draw(
        st.integers(min_value=1, max_value=len(entries)), "retain"
    )
    store.maintain(retain_days=k)
    assert store.days() == entries[-k:]
    retained = set(entries[-k:])
    for day, want in model_days:
        if day in retained:
            check(day, want)
        else:
            with pytest.raises(ValueError, match="not committed"):
                store.read_state(as_of=day)
    none_deltas = {
        n: None
        for n in (
            "fp_index", "shingle_index", "shingle_census",
            "bench_vocab", "source_stats",
        )
    }
    store._commit(
        "dz",
        {**none_deltas, "fp_index": spark.createDataFrame(
            [("zz",)], "fp string"
        )},
        meta={"w2": [0, 0], "keep_micro": 0, "max_doc_id": next_doc + 1},
    )
    last_want = dict(model_days[-1][1])
    last_want["fp"] = set(last_want["fp"]) | {"zz"}
    check("dz", last_want)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_store_random_chain_attached_protocol(
    spark, tmp_path_factory, data
):
    """The ATTACHED-table protocol (r17/r18) against a Python model,
    over arbitrary interleavings: the table attaches at a random day,
    later days randomly carry an attached delta or omit it (the pin
    must carry the LAST attached commit forward), compaction lands at
    random points (its pointer rows must keep carrying the attached
    pin — ``new_snaps = dict(snaps)``), and a final random retention
    must keep every retained day's ``read_attached`` equal to the
    model while expired days and pre-attach days fail with their two
    DISTINCT loud errors. The hand-written atomic-cycle tests pin one
    realistic sequence; this pins the pin-carry algebra itself."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    base = tmp_path_factory.mktemp("attprop")
    store = CurateStateStore(spark, str(base / "s"))
    mt = VersionedTable.create(
        spark, str(base / "m"), schema="run string, v bigint"
    )

    n_days = data.draw(st.integers(min_value=2, max_value=4), "n_days")
    attach_from = data.draw(
        st.integers(min_value=0, max_value=n_days - 1), "attach_from"
    )
    next_doc = 0
    cum_fp: set = set()
    cum_attached: list = []  # rows on the attached MAIN so far
    model: list = []  # (day, fp_set, attached_rows_at_pin | None)

    for i in range(n_days):
        day = f"d{i}"
        first = i == 0
        fps = data.draw(_FPS, f"fps{i}")
        if first and not fps:
            fps = {"z"}
        deltas = {
            "fp_index": (
                spark.createDataFrame(
                    [(f,) for f in sorted(fps)], "fp string"
                )
                if fps or first
                else None
            ),
            "shingle_index": (
                spark.createDataFrame(
                    [(next_doc, 1, 0)],
                    "doc_id bigint, n_sh bigint, shingle bigint",
                )
                if first
                else None
            ),
            "bench_vocab": (
                spark.createDataFrame([(99,)], "shingle bigint")
                if first
                else None
            ),
            "source_stats": (
                spark.createDataFrame(
                    [("s1", 10)], "source string, source_tokens bigint"
                )
                if first
                else None
            ),
        }
        deltas["shingle_census"] = (
            deltas["shingle_index"]
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            if deltas["shingle_index"] is not None
            else None
        )
        next_doc += 1
        attached = None
        if i >= attach_from and (
            i == attach_from or data.draw(st.booleans(), f"att{i}")
        ):
            k = data.draw(st.integers(min_value=1, max_value=3), f"k{i}")
            delta = spark.createDataFrame(
                [(day, j) for j in range(k)], "run string, v bigint"
            )
            attached = {"pack_manifest": (mt, delta, None)}
        store._commit(
            day,
            deltas,
            meta={"w2": [0, 0], "keep_micro": 0, "max_doc_id": next_doc},
            attached=attached,
        )
        cum_fp |= fps
        if attached is not None:
            cum_attached = cum_attached + [
                (day, j)
                for j in range(
                    attached["pack_manifest"][1].count()
                )
            ]
        model.append(
            (
                day,
                set(cum_fp),
                list(cum_attached) if i >= attach_from else None,
            )
        )
        if data.draw(st.booleans(), f"compact{i}"):
            store.compact()

    def check(day, fp_want, att_want):
        st_state, _m = store.read_state(as_of=day, prefer_mirror=False)
        assert {
            r["fp"] for r in st_state.fp_index.collect()
        } == fp_want, f"fp@{day}"
        if att_want is None:
            with pytest.raises(ValueError, match="attached after"):
                store.read_attached("pack_manifest", as_of=day)
        else:
            got = sorted(
                (r["run"], r["v"])
                for r in store.read_attached(
                    "pack_manifest", as_of=day
                ).collect()
            )
            assert got == sorted(att_want), f"attached@{day}"

    for day, fp_want, att_want in model:
        check(day, fp_want, att_want)

    entries = store.days()
    k = data.draw(
        st.integers(min_value=1, max_value=len(entries)), "retain"
    )
    store.maintain(retain_days=k)
    retained = set(entries[-k:])
    for day, fp_want, att_want in model:
        if day in retained:
            check(day, fp_want, att_want)
        else:
            with pytest.raises(ValueError, match="not committed"):
                store.read_attached("pack_manifest", as_of=day)
