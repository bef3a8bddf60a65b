"""Case-insensitive column resolution shared by the read and write
conform paths.

Spark's own analyzer resolves names case-insensitively by default
(spark.sql.caseSensitive=false); any code that matches DataFrame columns
against declared metadata with a plain Python ``in`` silently diverges
from it — the write-side symptom was conform() null-filling a present
column, the read-side symptom was read_table REPLACING real data with
typed nulls on case drift. One resolver, both call sites, so the
ambiguity rule and error wording cannot drift apart again.
"""

from __future__ import annotations


def resolve_columns(
    df_columns: list[str],
    declared_names: list[str],
    context: str,
) -> dict[str, str]:
    """Map ``lower(name) -> actual DataFrame column name`` for resolving
    declared (validated-lowercase) names against ``df_columns``.

    Two DataFrame columns differing only by case that both target a
    declared name are refused (Spark raises AMBIGUOUS_REFERENCE for that
    resolution) rather than silently resolved by iteration order;
    collisions on names NO declared field wants are tolerated
    (first-seen wins — such columns are dropped downstream anyway).
    """
    from etl_manager_spark.meta.table import MetadataError

    declared_lower = {n.lower() for n in declared_names}
    by_lower: dict[str, str] = {}
    for c in df_columns:
        low = c.lower()
        if low in by_lower and low in declared_lower and by_lower[low] != c:
            raise MetadataError(
                f"{context}: ambiguous columns for declared field {low!r}: "
                f"both {by_lower[low]!r} and {c!r} are present "
                "(case-insensitive resolution, matching Spark's "
                "AMBIGUOUS_REFERENCE)"
            )
        by_lower.setdefault(low, c)
    return by_lower


def quoted(name: str) -> str:
    """Backtick-quote a column name for use in a string selection so
    names containing dots (or backticks) are treated as literal column
    references, not struct-field access."""
    return "`" + name.replace("`", "``") + "`"
