"""Semi-structured `key=value` reply parsing (SURVEY.md §2.8 F5/F6/F9/F10).

The reference parses the EOS ``file info -m`` reply: space-separated
``key=value`` pairs, plus a length-prefixed escape hatch for the ``file`` key
because paths may contain spaces (main.go:182-207). The subtle part is the
length-prefixed extraction (main.go:192-198): the value of ``file`` starts at
``len("keylength.file=") + digits(len) + len(" file=")`` and runs for
``keylength.file`` bytes. Go slices are 0-indexed, Spark ``substring`` is
1-indexed — the reference's ``+7`` becomes ``+8`` here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# len("keylength.file=") == 15; 1-indexed start of the digits is position 16.
_KL_PREFIX = "keylength.file="
# len(" file=") == 6
_FILE_SEP = " file="


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_kv_map(raw: Column | str) -> Column:
    """Space-separated ``key=value`` pairs -> ``map<string,string>``.

    Exact parity with main.go:184-190: tokens are split on single spaces and
    only tokens that split into exactly two parts on ``=`` contribute an
    entry ("keep only len==2 splits"). Plain ``str_to_map`` would also admit
    ``a=b=c`` (as key ``a`` -> ``b=c``), so we filter explicitly:
    split -> keep tokens with exactly one '=' -> map_from_entries. Note a
    token like ``=v`` IS kept (empty-string key), exactly as the Go map
    assignment admits it — no extra key-non-empty filtering.
    """
    # Split each token on '=' exactly ONCE, binding the result array as the
    # lambda variable of the next stage. Lambda variables are materialized
    # values, so `a.getItem(0)`/`a.getItem(1)` are free lookups — the prior
    # formulation re-ran the regex split three times per token (once for the
    # size filter, twice for the struct fields), which was the bulk of the
    # round-3 warm-time regression (A/B'd at sf0.1: 0.98 -> 0.67 s median).
    toks = F.split(_col(raw), " ")
    arrs = F.transform(toks, lambda t: F.split(t, "=", -1))
    pairs = F.filter(arrs, lambda a: F.size(a) == 2)
    entries = F.transform(
        pairs,
        lambda a: F.struct(
            a.getItem(0).alias("key"), a.getItem(1).alias("value")
        ),
    )
    # Last-wins on duplicate keys, same as the Go map assignment loop.
    # Done structurally so the result is independent of
    # spark.sql.mapKeyDedupPolicy — map_from_entries only ever sees distinct
    # keys and cannot throw under the Spark-default EXCEPTION policy.
    # Formulation: reverse, then keep each entry whose key FIRST occurs at
    # its own position (first-wins on the reversed array == last-wins).
    # Shape matters: Catalyst does no CSE across higher-order lambdas, so an
    # inner lambda may only reference LAMBDA VARIABLES, never an outer
    # array expression — mentioning `entries` inside the filter would
    # re-evaluate the whole split pipeline per element (measured +0.7 s on
    # the sf0.1 bench). Wrapping the reversed array in a one-element
    # transform binds it as the materialized variable `es`, making every
    # inner reference a free lookup. The per-element keys projection is an
    # O(n^2) scan over a handful of materialized reply tokens — row-local
    # and cheap; this replaced an equivalent O(n^2) concat-fold
    # (F.aggregate) that rebuilt the accumulator array per element
    # (interleaved A/B at sf0.1, 7 rounds each: fold 0.716 s median ->
    # this 0.454 s, the round-3 regression fully recovered while keeping
    # conf-independence).
    dedup = F.transform(
        F.array(F.reverse(entries)),
        lambda es: F.filter(
            es,
            lambda e, i: F.array_position(
                F.transform(es, lambda x: x["key"]), e["key"]
            )
            == i + 1,
        ),
    )
    return F.map_from_entries(dedup.getItem(0))


def length_prefixed_value(raw: Column | str) -> Column:
    """Recover the ``file`` value (which may contain spaces) from a reply of
    the form ``keylength.file=<n> file=<path> ...`` (F10; main.go:192-198).

    start (1-indexed) = len("keylength.file=")        -- 15
                      + length(digits of n)
                      + len(" file=")                 -- 6
                      + 1                             -- 1-indexing
    i.e. Go's 0-indexed ``14 + len + 7`` becomes ``15 + len + 6 + 1``.
    Returns NULL if the reply does not start with the keylength prefix or the
    length fails to parse — callers dead-letter those rows (F9 semantics).
    """
    r = _col(raw)
    digits = F.regexp_extract(r, r"^keylength\.file=(\d+) file=", 1)
    # try_cast: ANSI mode (Spark 4 default) would throw on the '' no-match case
    n = digits.try_cast("int")
    start = F.lit(len(_KL_PREFIX)) + F.length(digits) + F.lit(len(_FILE_SEP)) + F.lit(1)
    return F.when(n.isNotNull(), F.substring(r, start, n)).otherwise(F.lit(None))


def safe_cast_long(col: Column | str) -> Column:
    """``string -> long`` with Go-error parity (F9; main.go:193,200,204).

    Spark's cast yields NULL on garbage where Go's ParseInt errors the row.
    Returns a struct ``(value, is_dead)``: ``is_dead`` is true when the input
    was non-null but failed to parse — pipelines route those rows to the
    dead-letter sink instead of silently propagating NULL.
    """
    c = _col(col)
    v = c.try_cast("long")
    return F.struct(
        v.alias("value"), (c.isNotNull() & v.isNull()).alias("is_dead")
    )
