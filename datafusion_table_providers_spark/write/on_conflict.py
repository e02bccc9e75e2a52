"""ON CONFLICT clause generation.

Reference analog: crates/common/src/util/on_conflict.rs:22-100 — the enum
``DoNothingAll | DoNothing(cols) | Upsert(cols)`` rendered to dialect SQL
(`ON CONFLICT ... DO UPDATE SET c = EXCLUDED.c`). DuckDB and SQLite share
the Postgres-style syntax; MySQL would render ``ON DUPLICATE KEY UPDATE``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple


@dataclass(frozen=True)
class OnConflict:
    kind: str  # "do_nothing_all" | "do_nothing" | "upsert"
    columns: Tuple[str, ...] = field(default_factory=tuple)

    @staticmethod
    def do_nothing_all() -> "OnConflict":
        return OnConflict("do_nothing_all")

    @staticmethod
    def do_nothing(columns: Sequence[str]) -> "OnConflict":
        return OnConflict("do_nothing", tuple(columns))

    @staticmethod
    def upsert(columns: Sequence[str]) -> "OnConflict":
        return OnConflict("upsert", tuple(columns))

    def to_sql(self, all_columns: Sequence[str], dialect_name: str) -> str:
        if dialect_name in ("duckdb", "sqlite", "postgres"):
            if self.kind == "do_nothing_all":
                return "ON CONFLICT DO NOTHING"
            target = "(" + ", ".join(f'"{c}"' for c in self.columns) + ")"
            if self.kind == "do_nothing":
                return f"ON CONFLICT {target} DO NOTHING"
            sets = ", ".join(
                f'"{c}" = EXCLUDED."{c}"'
                for c in all_columns
                if c not in self.columns
            )
            return f"ON CONFLICT {target} DO UPDATE SET {sets}"
        if dialect_name == "mysql":
            if self.kind in ("do_nothing_all", "do_nothing"):
                # MySQL idiom: no-op self-assignment on duplicate key
                first = all_columns[0]
                return f"ON DUPLICATE KEY UPDATE `{first}` = `{first}`"
            sets = ", ".join(
                f"`{c}` = VALUES(`{c}`)"
                for c in all_columns
                if c not in self.columns
            )
            return f"ON DUPLICATE KEY UPDATE {sets}"
        raise ValueError(f"on_conflict unsupported for dialect {dialect_name}")
