from __future__ import annotations

import pyspark.sql.functions as F

from cernbox_migration_database_spark.operators import bpe as BPE


def test_merge_fold_greedy_left_to_right(spark):
    df = spark.createDataFrame([("aaa",), ("abab",), ("b",)], "word string")
    out = df.select(
        F.col("word"),
        BPE._merge_fold(BPE._chars(F.col("word")), "a", "a").alias("m_aa"),
        BPE._merge_fold(BPE._chars(F.col("word")), "a", "b").alias("m_ab"),
    ).collect()
    by_word = {r.word: r for r in out}
    # "aaa" + (a,a) -> [aa, a]: the merged symbol never re-merges greedily
    assert by_word["aaa"].m_aa == ["aa", "a"]
    assert by_word["abab"].m_ab == ["ab", "ab"]
    assert by_word["b"].m_aa == ["b"]


def test_merge_rounds_learn_most_frequent_pair(spark):
    words = spark.createDataFrame(
        [("aa", 10), ("ab", 3), ("ba", 1)], "word string, freq long"
    )
    res = BPE.bpe_merge_rounds(spark, words, 2).collect()
    assert res[0].round == 1
    assert (res[0].merge_l, res[0].merge_r, res[0].cnt) == ("a", "a", 10)
    # after merging (a,a), remaining pairs: (a,b)=3, (b,a)=1
    assert (res[1].merge_l, res[1].merge_r, res[1].cnt) == ("a", "b", 3)


def test_encode_applies_merges_in_order_hierarchically(spark):
    words = spark.createDataFrame(
        [("stream", 2), ("stress", 1), ("rest", 1), ("s", 1)],
        "word string, freq long",
    )
    merges = [("s", "t"), ("r", "e"), ("st", "re"), ("stre", "a"), ("strea", "m")]
    enc = {
        r.word: r.tokens
        for r in BPE.bpe_encode_words(words, merges).collect()
    }
    # (s,t)->[st,r,e,a,m]; (r,e)->[st,re,a,m]; (st,re)->[stre,a,m];
    # (stre,a)->[strea,m]; (strea,m)->[stream]
    assert enc["stream"] == ["stream"]
    # stress: [st,r,e,s,s] -> [st,re,s,s] -> [stre,s,s] (later merges no-op)
    assert enc["stress"] == ["stre", "s", "s"]
    # rest: [r,e,s,t] -> (s,t) fires first -> [r,e,st] -> (r,e) -> [re,st];
    # (st,re) does NOT fire: order is re,st not st,re
    assert enc["rest"] == ["re", "st"]
    assert enc["s"] == ["s"]


def test_token_stats_weighted_by_freq_and_multiplicity(spark):
    words = spark.createDataFrame(
        [("aba", 5), ("aa", 2)], "word string, freq long"
    )
    enc = BPE.bpe_encode_words(words, [])  # no merges: char tokens
    stats = {r.token: r for r in BPE.token_stats(enc).collect()}
    # 'a' occurs 2x in aba (freq 5) and 2x in aa (freq 2) -> 10 + 4
    assert (stats["a"].n_words, stats["a"].occurrences) == (2, 14)
    assert (stats["b"].n_words, stats["b"].occurrences) == (1, 5)
