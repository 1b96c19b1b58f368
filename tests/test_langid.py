"""Char-bigram NB language ID (operators/langid.py): real classification
behavior on held-out sentences + the exactness properties the oracle
pairing depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import langid as L

# Held-out sentences (NOT in the training corpus).
HELD_OUT = [
    ("en", "she walked along the river and thought about the long summer"),
    ("de", "die frau ging am fluss entlang und dachte an den langen sommer"),
    ("es", "la mujer camino junto al rio pensando en el largo verano"),
    ("fr", "la femme marchait le long de la riviere en pensant au long ete"),
]


def test_model_shape():
    assert L.LANGS == ("de", "en", "es", "fr")
    assert 0 < len(L.MODEL) <= L.TOP_K
    for bg, scores in L.MODEL.items():
        assert len(bg) == 2 and len(scores) == len(L.LANGS)
        assert all(isinstance(s, int) for s in scores)  # exact arithmetic
        # centered: per-bigram scores roughly sum to zero (quantization
        # leaves at most len(LANGS)/2 rounding units)
        assert abs(sum(scores)) <= len(L.LANGS)


def test_classifies_held_out_sentences(spark):
    df = spark.createDataFrame(HELD_OUT, ["expected", "text"])
    rows = L.with_langid(df).select("expected", "lang_pred").collect()
    got = {r["expected"]: r["lang_pred"] for r in rows}
    assert got == {lang: lang for lang, _ in HELD_OUT}


def test_short_and_empty_text(spark):
    # < 2 normalized chars -> no bigrams -> all-zero scores -> first lang
    # (alphabetical tie-break), never an error
    df = spark.createDataFrame([("",), ("a",), ("42 !!",)], ["text"])
    rows = L.with_langid(df).collect()
    assert [r["lang_pred"] for r in rows] == ["de", "de", "de"]
    assert [r["lang_score"] for r in rows] == [0, 0, 0]


def test_python_and_spark_normalization_agree(spark):
    raw = "  Héllo,   WORLD!!  42 times\tover  "
    df = spark.createDataFrame([(raw,)], ["text"])
    spark_norm = df.select(L.norm_expr("text").alias("n")).collect()[0]["n"]
    assert spark_norm == L._normalize_py(raw)


def test_oracle_matches_spark_on_fixture_rows():
    """Differential on a tiny inline table: the generated oracle SQL and the
    Spark scorer must produce identical (lang_pred, lang_score) rows."""
    import duckdb

    from cernbox_migration_database_spark.session import get_spark

    spark = get_spark(app_name="cbx-tests", shuffle_partitions=8)
    data = [(i, "xx", txt) for i, (_, txt) in enumerate(HELD_OUT)] + [
        (97, "xx", ""),
        (98, "xx", "a"),
    ]
    sdf = spark.createDataFrame(data, ["doc_id", "lang", "text"])
    got = {
        r["doc_id"]: (r["lang_pred"], r["lang_score"])
        for r in L.with_langid(sdf)
        .select("doc_id", "lang_pred", "lang_score")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?, ?)" for _ in data)
        + ") t(doc_id, lang, text)",
        [x for row in data for x in row],
    )
    want = {
        row[0]: (row[2], row[3])
        for row in con.execute(L.oracle_sql()).fetchall()
    }
    assert got == want


def test_fluency_ranks_english_over_german(spark):
    """The EN bigram LM must score the held-out English sentence above the
    German one (mean log-prob), and degenerate inputs must not error."""
    df = spark.createDataFrame(
        [("en", HELD_OUT[0][1]), ("de", HELD_OUT[1][1]), ("empty", "")],
        ["tag", "text"],
    )
    rows = {
        r["tag"]: r
        for r in L.with_fluency(df).collect()
    }
    assert rows["en"]["fluency"] > rows["de"]["fluency"]
    assert rows["empty"]["n_bigrams"] == 0
    assert rows["empty"]["fluency_q"] == 0
    assert rows["empty"]["fluency"] is None
