"""Property-based tests (hypothesis): invariants the golden tests can't pin.

The most load-bearing one checks the cross-engine determinism policy
itself: the scaled-integer exact sum must produce BIT-IDENTICAL doubles
in Spark and DuckDB for arbitrary float inputs — that property is what
every oracle-checked aggregate rests on.
"""


import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_data_workflow_spark.operators.strings import clean_text

money = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(money, min_size=1, max_size=300))
def test_dsum_bit_identical_across_engines(spark, values):
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.plans.relational import dsum

    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(dsum(F.col("x")).alias("s")).first()["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = con.sql(
        "SELECT CAST(SUM(CAST(ROUND(x*1000000.0) AS DECIMAL(38,0))) AS DOUBLE)/1000000.0 FROM t"
    ).fetchone()[0]
    assert got == want  # exact equality, not approx — the whole point


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=60))
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once
    assert once == once.strip().lower()
    # reference-exact contract: no SPACE survives anywhere (runs become
    # '_'); other whitespace (tabs etc.) survives in the interior only
    assert " " not in once


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8), min_size=2, max_size=6)
)
def test_jaccard_bounds_and_symmetry(spark, token_lists):
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.llmdata.dedup import jaccard

    rows = [(list(set(a)), list(set(b))) for a in token_lists for b in token_lists]
    df = spark.createDataFrame(rows, "a array<string>, b array<string>")
    out = df.select(
        jaccard(F.col("a"), F.col("b")).alias("jab"),
        jaccard(F.col("b"), F.col("a")).alias("jba"),
        (F.sort_array(F.col("a")) == F.sort_array(F.col("b"))).alias("same"),
    ).collect()
    for r in out:
        assert 0.0 <= r["jab"] <= 1.0
        assert r["jab"] == pytest.approx(r["jba"])  # symmetric
        if r["same"]:
            assert r["jab"] == pytest.approx(1.0)  # identical sets → 1


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=40
    ),
)
def test_asof_join_matches_bruteforce(spark, rights, lefts):
    import pandas as pd

    from simple_data_workflow_spark.operators.joins import asof_join

    rrows = [(f"k{k}", float(t), i, v) for i, (k, t, v) in enumerate(rights)]
    lrows = [(i, f"k{k}", float(t)) for i, (k, t) in enumerate(lefts)]
    right = spark.createDataFrame(rrows, "key string, rts double, rid long, val double")
    left = spark.createDataFrame(lrows, "id long, key string, ts double")
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_payload=["val"], right_tiebreak="rid",
    ).toPandas()
    # brute-force oracle: max (rts, rid) among right rows with rts <= ts
    want = {}
    for lid, k, t in lrows:
        cands = [(rt, rid, v) for (rk, rt, rid, v) in rrows if rk == k and rt <= t]
        want[lid] = max(cands)[2] if cands else None
    got = {r.id: (None if pd.isna(r.val) else r.val) for r in out.itertuples()}
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 3), money), min_size=1, max_size=200
    )
)
def test_two_level_agg_equals_single_decimal_pass(spark, rows):
    """exact_grouped_agg (long partials + DECIMAL reduce) must equal the
    single-pass DECIMAL dsum exactly, under any grouping/partitioning."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.plans.relational import dsum, exact_grouped_agg

    df = spark.createDataFrame(
        [(f"g{k}", v) for k, v in rows], "k string, x double"
    ).repartition(5)
    got = {
        r["k"]: r["s"]
        for r in exact_grouped_agg(df, ["k"], sums={"s": F.col("x")}).collect()
    }
    want = {
        r["k"]: r["s"] for r in df.groupBy("k").agg(dsum(F.col("x")).alias("s")).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=60),
    st.integers(1, 64),
)
def test_pack_sequences_is_contiguous_stream(spark, token_counts, budget):
    """Packing invariants for any corpus/budget: start offsets are the
    exact prefix sums (the stream has no holes and no overlaps), bins
    cover [start, start+tokens) correctly, and the result is independent
    of shard count."""
    from simple_data_workflow_spark.llmdata.packing import pack_sequences

    rows = [(i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    for n_shards in (1, 4):
        out = {
            r["doc_id"]: r
            for r in pack_sequences(
                df, token_col="n_tok", budget=budget, n_shards=n_shards
            ).collect()
        }
        acc = 0
        for i, n in enumerate(token_counts):
            r = out[i]
            assert r["start_token"] == acc
            assert r["bin_id"] == acc // budget
            assert r["n_bins"] == (acc + max(n, 1) - 1) // budget - acc // budget + 1
            acc += n


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=80),
       st.integers(0, 100))
def test_split_is_deterministic_and_group_atomic(spark, groups, pct):
    from simple_data_workflow_spark.llmdata.packing import split_train_holdout

    df = spark.createDataFrame([(i, g) for i, g in enumerate(groups)], "id long, g string")
    out = split_train_holdout(df, "g", holdout_pct=pct).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # group-atomic
    if pct == 0:
        assert all(s == {"train"} for s in by_group.values())
    if pct == 100:
        assert all(s == {"holdout"} for s in by_group.values())


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 120), st.integers(8, 24), st.integers(0, 7))
def test_chunk_windows_reconstruct_the_token_stream(spark, n_tokens, chunk, overlap):
    """Chunking invariants for any (doc length, window, overlap):
    consecutive chunks share exactly `overlap` tokens, concatenating
    each chunk's non-overlapping tail reproduces the document, and no
    emitted window sits entirely inside the previous one."""
    from simple_data_workflow_spark.llmdata.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    stride = chunk - overlap
    rebuilt = []
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["chunk_n_tokens"] <= chunk
        if i == 0:
            rebuilt = toks
        else:
            prev = rows[i - 1]["chunk_text"].split(" ")
            assert prev[stride:stride + overlap] == toks[:len(prev) - stride]
            rebuilt += toks[overlap:]
        assert r["chunk_id"] == i
    assert rebuilt == text.split(" ")


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab.$(", min_size=0, max_size=6),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
def test_fuzzy_pairs_equals_bruteforce_property(spark, strings):
    """Deletion-variant blocking finds EXACTLY the levenshtein<=1 pairs
    on arbitrary strings — including regex metacharacters ('.', '$',
    '(') that would break an unquoted pattern, and empty strings."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.llmdata.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        list(enumerate(strings)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, max_edit=1).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein("a.text", "b.text").alias("dist"),
        )
        .where(F.col("dist") <= 1)
        .collect()
    }
    assert got == brute


# --- filtered interop reads: pruning must NEVER drop matching rows ----

_SKIP_TABLES = {}


def _skip_fixture(spark, tmp_base):
    """Two small Delta tables built once per session: range-clustered
    (min/max stats evidence) and partitioned incl. a NULL partition
    value (partitionValues evidence)."""
    if _SKIP_TABLES:
        return _SKIP_TABLES
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_writer import delta_write

    df = spark.range(0, 200).select(
        F.col("id").cast("long"),
        F.when(F.col("id") % 17 == 0, None)
        .otherwise((F.col("id") % 5).cast("string"))
        .alias("g"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise(F.col("id") * 1.5)
        .alias("v"),
    )
    p1 = f"{tmp_base}/skiprc"
    delta_write(df.repartitionByRange(6, "id"), p1, mode="error")
    p2 = f"{tmp_base}/skippart"
    delta_write(df, p2, mode="error", partition_by=["g"])
    _SKIP_TABLES["plain"] = p1
    _SKIP_TABLES["part"] = p2
    return _SKIP_TABLES


_ops = st.sampled_from(["==", "!=", "<", "<=", ">", ">=", "in", "isnull", "notnull"])
_cols = st.sampled_from(["id", "g", "v"])
# values type-consistent with their column (cross-typed filters raise
# under ANSI casts in the REFERENCE scan too; the evaluators'
# cross-type conservatism has its own dedicated unit pins)
_vals_by_col = {
    "id": st.integers(min_value=-5, max_value=210),
    "g": st.sampled_from(["0", "1", "2", "3", "4", "zz", ""]),
    "v": st.floats(min_value=-10, max_value=320, allow_nan=False),
}


@st.composite
def _filter_lists(draw):
    n = draw(st.integers(min_value=1, max_value=3))
    out = []
    for _ in range(n):
        col, op = draw(_cols), draw(_ops)
        vals = _vals_by_col[col]
        if op == "in":
            out.append((col, op, tuple(draw(st.lists(vals, min_size=1, max_size=3)))))
        elif op in ("isnull", "notnull"):
            out.append((col, op, None))
        else:
            out.append((col, op, draw(vals)))
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_filter_lists())
def test_delta_filtered_read_equals_filtered_full_scan(
    spark, tmp_path_factory, filters
):
    """PROPERTY: for ANY filter list, the skipping read returns exactly
    the rows a row-filter over the FULL scan returns — i.e. file
    pruning never drops a matching row and the row filter never leaks
    one. Exercises stats evidence, partition-value evidence (typed +
    NULL partitions), and null/NaN edge cases."""
    from simple_data_workflow_spark.sources.delta_reader import (
        _filters_expr,
        delta_read,
    )

    tables = _skip_fixture(
        spark, str(tmp_path_factory.mktemp("skipprops"))
    )
    for path in tables.values():
        want = {
            tuple(r)
            for r in delta_read(spark, path)
            .where(_filters_expr(filters))
            .collect()
        }
        got = {
            tuple(r) for r in delta_read(spark, path, filters=filters).collect()
        }
        assert got == want, (filters, path)


_ICE_TABLES = {}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_filter_lists())
def test_iceberg_filtered_read_equals_filtered_full_scan(
    spark, tmp_path_factory, filters
):
    """Same property for the Iceberg reader: identity-partition
    pruning (incl. a NULL partition) must never change the result of a
    filtered scan."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.sources.delta_reader import _filters_expr
    from simple_data_workflow_spark.sources.iceberg_reader import iceberg_read
    from simple_data_workflow_spark.sources.iceberg_writer import iceberg_write

    if "p" not in _ICE_TABLES:
        df = spark.range(0, 150).select(
            F.col("id").cast("long"),
            F.when(F.col("id") % 11 == 0, None)
            .otherwise((F.col("id") % 4).cast("string"))
            .alias("g"),
            (F.col("id") * 0.5).alias("v"),
        )
        p = str(tmp_path_factory.mktemp("iceprops")) + "/t"
        iceberg_write(df, p, mode="error", partition_by=["g"])
        _ICE_TABLES["p"] = p
    p = _ICE_TABLES["p"]
    want = {
        tuple(r)
        for r in iceberg_read(spark, p).where(_filters_expr(filters)).collect()
    }
    got = {tuple(r) for r in iceberg_read(spark, p, filters=filters).collect()}
    assert got == want, filters
