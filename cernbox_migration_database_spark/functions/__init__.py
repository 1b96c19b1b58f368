from .kv import length_prefixed_value, parse_kv_map, safe_cast_long
from .numeric import davg, dsum, dsum_expr
from .paths import (
    VERSIONS_PREFIX,
    path_base,
    path_clean,
    path_dir,
    path_parent_name,
    quote_audit,
    versions_path,
)

__all__ = [
    "VERSIONS_PREFIX",
    "path_dir",
    "path_base",
    "path_clean",
    "path_parent_name",
    "versions_path",
    "quote_audit",
    "parse_kv_map",
    "length_prefixed_value",
    "safe_cast_long",
    "dsum",
    "davg",
    "dsum_expr",
]
