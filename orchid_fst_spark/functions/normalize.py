"""Key-normalization expressions — pure Catalyst (JVM, codegen'd).

The reference sorts/keys on *trimmed* lines (large_file_sorter.cpp:329)
and handles text at UTF-8 character granularity (utf8_util.cpp:78-90).
Here normalization is a column expression so it inlines into the scan
stage; the raw ``text`` column is NEVER routed through any of these
(byte-identical pass-through invariant, BASELINE.json input_hint).

Every expression here has an exact ANSI-SQL twin used in the DuckDB
oracles (``oracle_sql``) — keep them in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# regex shared with the DuckDB oracle SQL — change both or neither
HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"


def norm_key(col) -> Column:
    """lower + trim + collapse internal whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def url_host(col) -> Column:
    """Host part of a URL via regexp (portable to the DuckDB oracle;
    Spark's parse_url is not available in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, HOST_RE, 1)


def block_key(col, prefix_len: int) -> Column:
    """Blocking key = first ``prefix_len`` chars of the normalized key —
    the Spark realization of the reference's ``samePrefixLen`` pinned
    prefix (fst.cpp:530-553)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, prefix_len)


def tokens(col) -> Column:
    """Whitespace tokens of a normalized string (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")
