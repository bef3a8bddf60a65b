"""Format registry — the Spark-native analogue of the reference's Hive SerDe
templates (``/root/reference/etl_manager/specs/*_specific.json``).

Each reference ``data_format`` maps to a Spark DataSource format + default
options; per-table ``format_options`` are deep-merged over the defaults the
same way the reference deep-merges ``glue_specific`` over its base + format
specs (``utils.py:38-51``, applied at ``meta.py:434-436``).

| agnostic format     | reference SerDe (spec file)              | Spark source |
|---------------------|------------------------------------------|--------------|
| csv                 | LazySimpleSerDe, headerless (csv_specific.json)        | csv |
| csv_quoted_nodate   | OpenCSVSerDe quote=" escape=\\ (csv_quoted_nodate...)  | csv + quote/escape; all-string read then cast |
| json                | openx JsonSerDe (json_specific.json)                   | json |
| parquet / par       | ParquetHiveSerDe (parquet_specific.json)               | parquet |
| orc                 | OrcSerde (orc_specific.json)                           | orc |
| avro                | AvroSerDe (avro_specific.json)                         | avro |
| regex               | RegexSerDe input.regex (regex_specific.json)           | text + regexp_extract projection |
"""

from __future__ import annotations

import copy
from typing import Any

_FORMAT_DEFAULTS: dict[str, tuple[str, dict[str, Any]]] = {
    # Headerless, unquoted, comma-delimited — LazySimpleSerDe semantics:
    # schema applies positionally (reference README.md:116).
    "csv": ("csv", {"header": "false", "sep": ","}),
    # OpenCSVSerDe: quoted fields, backslash escape. Athena reads every
    # column as string and casts afterwards; readers.py reproduces that
    # (read all-string, then cast to the declared schema).
    "csv_quoted_nodate": (
        "csv",
        {"header": "false", "sep": ",", "quote": '"', "escape": "\\"},
    ),
    # JSON-lines with by-name field mapping (the SerDe's `paths` property is
    # redundant in Spark).
    "json": ("json", {}),
    "parquet": ("parquet", {}),
    "par": ("parquet", {}),
    "orc": ("orc", {}),
    "avro": ("avro", {}),
    # Line-oriented regex extraction; handled specially in readers.py via
    # spark.read.text + regexp_extract. The option carries the pattern.
    "regex": ("text", {"input.regex": "(.*)"}),
    # Fixed-width line scan (legacy mainframe/log layouts); handled in
    # readers.py via spark.read.text + substring projections. The option
    # carries the per-column CHARACTER widths as a comma string,
    # positional like the headerless csv format. Widths count decoded
    # characters, not bytes (F.substring is character-based) — a
    # byte-offset layout with multibyte text needs a byte-width variant,
    # which this format deliberately does not promise.
    "fixedwidth": ("text", {"widths": ""}),
}


def spark_format_and_options(
    data_format: str, overrides: dict[str, Any] | None = None
) -> tuple[str, dict[str, Any]]:
    """Resolve (spark_format, options) for an agnostic format with per-table
    overrides merged on top of the defaults."""
    fmt, defaults = _FORMAT_DEFAULTS[data_format]
    options = copy.deepcopy(defaults)
    options.update(overrides or {})
    return fmt, options
