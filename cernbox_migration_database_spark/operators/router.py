"""4-way decision router (SURVEY.md §2.2 P4-P6; main.go:280-315).

The heart of the reference job: per row, exactly one of
  ALREADY_VERSION   basename starts with '.sys.v#.'  -> audit only (main.go:280-283)
  NOT_UNDER_HOME    path not under the user prefix   -> audit only (main.go:284-287)
  PARENT_IS_VERSION parent dir starts with '.sys.v#.'-> update via parent dir (main.go:288-303)
  DEFAULT           otherwise                        -> update via versions folder (main.go:304-315)

Spark-first: one ``when/otherwise`` chain producing a ``decision`` column —
a single pass, codegen'd, no per-row branching in Python. Branch DataFrames
are filters over the same plan, so Catalyst computes the decision once per
row regardless of how many branches are consumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.paths import VERSIONS_PREFIX, path_base, path_parent_name

ALREADY_VERSION = "ALREADY_POINTS_TO_VERSION_FOLDER"
NOT_UNDER_HOME = "NOT_UNDER_HOME"
PARENT_IS_VERSION = "POINTS_TO_A_VERSION"
DEFAULT = "DEFAULT"

DECISIONS = (ALREADY_VERSION, NOT_UNDER_HOME, PARENT_IS_VERSION, DEFAULT)


def decision_col(
    path: Column | str,
    home_prefix: str = "/eos/",
    prefix: str = VERSIONS_PREFIX,
) -> Column:
    """The router as a single expression. Branch order matters and matches
    the reference exactly: P4 (already a versions folder) wins over P5
    (outside home), which wins over P6 (parent is a versions folder)."""
    p = F.col(path) if isinstance(path, str) else path
    return (
        F.when(path_base(p).startswith(prefix), F.lit(ALREADY_VERSION))
        .when(~p.startswith(home_prefix), F.lit(NOT_UNDER_HOME))
        .when(path_parent_name(p).startswith(prefix), F.lit(PARENT_IS_VERSION))
        .otherwise(F.lit(DEFAULT))
    )


def with_decision(
    df: DataFrame,
    path_col: str = "path",
    home_prefix: str = "/eos/",
    out_col: str = "decision",
) -> DataFrame:
    return df.withColumn(out_col, decision_col(path_col, home_prefix))


def route_shares(
    df: DataFrame,
    path_col: str = "path",
    home_prefix: str = "/eos/",
) -> dict[str, DataFrame]:
    """Split into the four disjoint, exhaustive branch DataFrames."""
    routed = with_decision(df, path_col, home_prefix)
    return {d: routed.filter(F.col("decision") == d) for d in DECISIONS}
