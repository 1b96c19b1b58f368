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
