"""SQL-string front end (cernbox_migration_database_spark/sql.py):
cbx.* references resolve to snapshot temp views — current, @vN, @tag,
@branch, and the change-feed relation — then Catalyst runs the string
verbatim."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from cernbox_migration_database_spark import sql as SQL
from cernbox_migration_database_spark.operators import table_format as TF


def _mk(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(
        spark.createDataFrame(
            [Row(id=i, grp="ab"[i % 2], val=float(10 * i)) for i in range(8)]
        ),
        root,
    )
    return root


def test_current_version_tag_branch_and_literal_masking(spark, tmp_path):
    root = _mk(spark, tmp_path)
    TF.create_tag(root, "rel1")
    TF.update_where(spark, root, "id % 2 = 0", {"val": "val + 1000"})
    br = TF.create_branch(root, "exp")
    TF.update_where(spark, br, "id = 1", {"val": "val + 5"})
    cat = SQL.SqlCatalog(spark, {"t": root})

    cur = cat.sql("SELECT SUM(val) AS s FROM cbx.t").first()["s"]
    assert cur == sum(10.0 * i for i in range(8)) + 4000.0
    v1 = cat.sql("SELECT SUM(val) AS s FROM cbx.t@v1").first()["s"]
    assert v1 == sum(10.0 * i for i in range(8))
    tag = cat.sql("SELECT SUM(val) AS s FROM cbx.t@rel1").first()["s"]
    assert tag == v1
    bexp = cat.sql("SELECT val FROM cbx.t@exp WHERE id = 1").first()["val"]
    assert bexp == 15.0
    # a quoted literal containing a reference is never rewritten
    lit = cat.sql(
        "SELECT 'cbx.t@v1' AS tagged, COUNT(*) AS n FROM cbx.t"
    ).first()
    assert lit["tagged"] == "cbx.t@v1" and lit["n"] == 8
    # snapshot isolation: the resolved view pins the call-time version
    df = cat.sql("SELECT SUM(val) AS s FROM cbx.t")
    TF.update_where(spark, root, "id = 0", {"val": "val + 7"})
    assert df.first()["s"] == cur


def test_changes_relation_and_errors(spark, tmp_path):
    root = _mk(spark, tmp_path)
    # additive so EVERY matched row's value actually changes (a doubled
    # zero is diff-invisible, correctly)
    TF.update_where(spark, root, "id % 2 = 0", {"val": "val * 2 + 3"})
    cat = SQL.SqlCatalog(spark, {"t": (root, "id")})
    got = {
        (r["id"], r["_change_type"])
        for r in cat.sql(
            "SELECT id, _change_type FROM cbx.changes(t, 1, 2)"
        ).collect()
    }
    assert got == {(i, "update") for i in range(8) if i % 2 == 0}
    # joins between a snapshot and the feed work in one statement
    n = cat.sql(
        "SELECT COUNT(*) AS n FROM cbx.t@v1 a "
        "JOIN cbx.changes(t, 1, 2) c ON c.id = a.id"
    ).first()["n"]
    assert n == 4

    with pytest.raises(KeyError, match="registered"):
        cat.sql("SELECT * FROM cbx.nope")
    with pytest.raises(KeyError, match="tag or branch"):
        cat.sql("SELECT * FROM cbx.t@missing")
    keyless = SQL.SqlCatalog(spark, {"t": root})
    with pytest.raises(ValueError, match="merge key"):
        keyless.sql("SELECT * FROM cbx.changes(t, 1, 2)")


def test_timestamp_time_travel(spark, tmp_path):
    """@ts:<unix> resolves to the version current at that instant —
    the AS OF TIMESTAMP form through SQL text."""
    import time

    root = _mk(spark, tmp_path)
    time.sleep(0.05)
    t_between = time.time()
    time.sleep(0.05)
    TF.update_where(spark, root, "id = 1", {"val": "val + 100"})
    cat = SQL.SqlCatalog(spark, {"t": root})
    old = cat.sql(
        f"SELECT val FROM cbx.t@ts:{t_between} WHERE id = 1"
    ).first()["val"]
    assert old == 10.0
    now = cat.sql("SELECT val FROM cbx.t WHERE id = 1").first()["val"]
    assert now == 110.0
