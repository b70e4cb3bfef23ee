"""Column-name cleaning and renaming (reference parity: operator O4).

Behavioral parity with the reference's name normalization
(`/root/reference/PostgresDatabase.py:106-118`: lowercase; space/`-`/`/`/`\\`
-> `_`; strip `?()%$`) followed by a user rename map
(`/root/reference/PostgresDatabase.py:120-125`, map defined at
`/root/reference/ETLManager.py:42-48`).

Implemented as pure metadata projections (`toDF` / `withColumnsRenamed`) —
zero data movement, the physical plan is unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_STRIP = re.compile(r"[?()%$]")


def clean_name(name: str) -> str:
    """Normalize one column name: lowercase, separators -> ``_``,
    punctuation stripped, repeated/trailing underscores collapsed.

    Separators are ``-``/``/``/``\\`` plus anything ``str.isspace()``
    considers whitespace — regex ``\\s`` misses the ``\\x1c``-``\\x1f``
    block that ``str.strip()`` removes, which broke idempotence
    (hypothesis-found)."""
    out = "".join("_" if (ch.isspace() or ch in "-/\\") else ch for ch in name.lower())
    out = _STRIP.sub("", out)
    out = re.sub(r"_+", "_", out).strip("_")
    return out


def clean_columns(df: DataFrame) -> DataFrame:
    """Apply :func:`clean_name` to every column (metadata-only)."""
    cleaned = [clean_name(c) for c in df.columns]
    if len(set(cleaned)) != len(cleaned):
        dupes = sorted({c for c in cleaned if cleaned.count(c) > 1})
        raise ValueError(f"clean_columns would produce duplicate names: {dupes}")
    return df.toDF(*cleaned)


def rename_columns(df: DataFrame, mapping: dict[str, str] | None) -> DataFrame:
    """Rename columns through a user mapping; missing keys are ignored
    (matches the reference's ``df.rename`` semantics)."""
    if not mapping:
        return df
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)
