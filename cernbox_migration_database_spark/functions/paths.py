"""Path/string expression layer (SURVEY.md §2.8 F1-F4, F7, F8, F11-F13).

The reference derives a versions-folder path ``dir/.sys.v#.name`` from each
file path with Go's ``path`` package (main.go:141-146, main.go:278-279).
Every helper here returns a Catalyst Column built from built-in functions —
JVM-side, whole-stage-codegen'd, no Python UDFs — so the expressions inline
into the scan/join plan and cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# main.go:21 — `VERSIONS_PREFIX = ".sys.v#."`
VERSIONS_PREFIX = ".sys.v#."


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def path_base(path: Column | str) -> Column:
    """Basename — last `/`-separated segment (F2; main.go:144,280).

    ``substring_index(p, '/', -1)``: for ``/a/b/c`` -> ``c``; for a path with
    no slash returns the path itself, matching Go ``path.Base`` on cleaned
    paths.
    """
    return F.substring_index(_col(path), "/", -1)


def path_dir(path: Column | str) -> Column:
    """Parent directory (F1; main.go:143,290).

    Everything before the final slash; ``/a/b/c`` -> ``/a/b``. For a
    slash-less input Go's ``path.Dir`` returns ``.``; we reproduce that so
    router semantics match on degenerate rows.
    """
    p = _col(path)
    base = path_base(p)
    d = F.substring(p, 1, F.length(p) - F.length(base) - F.lit(1))
    d = F.when(p == base, F.lit(".")).otherwise(d)
    # Go path.Dir("/x") == "/" (the slice above yields "")
    return F.when(d == "", F.lit("/")).otherwise(d)


def path_clean(path: Column | str) -> Column:
    """Collapse duplicate slashes and trim a trailing slash (F4; main.go:278
    uses ``path.Clean`` before splitting)."""
    p = F.regexp_replace(_col(path), "/+", "/")
    p = F.when(p == "/", p).otherwise(F.regexp_replace(p, "/$", ""))
    return p


def path_parent_name(path: Column | str) -> Column:
    """Name of the immediate parent directory — ``parts[len(parts)-2]`` in the
    reference (F7; main.go:278-279). ``element_at(split(p,'/'), -2)``."""
    return F.element_at(F.split(path_clean(path), "/"), -2)


def versions_path(path: Column | str, prefix: str = VERSIONS_PREFIX) -> Column:
    """``dir/.sys.v#.base`` (F3+F13; main.go:143-145)."""
    p = _col(path)
    d = path_dir(p)
    joined = F.concat_ws("/", d, F.concat(F.lit(prefix), path_base(p)))
    # path.Join collapses the dir=="/" case to "/.sys.v#.base", not "//..."
    return F.when(
        d == "/", F.concat(F.lit("/"), F.lit(prefix), path_base(p))
    ).otherwise(joined)


def quote_audit(path: Column | str) -> Column:
    """Double-quote a path for the audit line, escaping embedded quotes
    (F11; main.go:277 uses strconv.Quote — cosmetic parity only)."""
    escaped = F.regexp_replace(_col(path), '"', '\\\\"')
    return F.concat(F.lit('"'), escaped, F.lit('"'))
