"""SQLite as a first-class Spark source via the Python DataSource API.

The reference serves its sampled tables from ``small_tables.db``
(reference main.py:300-338) and reads them back with raw ``sqlite3``
calls in the dashboard (reference dashboard.py:8-25).  Here the read
side is a REAL Spark data source (Spark 4.0's Python DataSource API,
4.1's filter pushdown): ``spark.read.format("sqlite")`` plans a
distributed scan with

- **schema inference** from SQLite's declared column affinities
  (PRAGMA table_info → Spark types, driver-side, no data pass);
- **rowid-range partitions** — the table splits into N contiguous
  rowid slices, one connection per task, so a big table fans out
  across executors instead of bottlenecking on one driver read;
- **filter pushdown** (Spark 4.1 ``pushFilters``) — equality, range,
  IN, NULL-ness and string prefix/suffix/contains predicates compile
  to a SQLite ``WHERE`` clause evaluated inside the storage engine,
  so only surviving rows cross the Python↔JVM boundary.  Anything
  unsupported is left for Spark to re-evaluate (the API's contract:
  returned filters = NOT pushed);
- **Arrow batches** — each partition yields ``pyarrow.RecordBatch``
  chunks (not per-row tuples), the vectorized path through the
  Python worker.

Scale note: SQLite itself is a single-file serving store — the 100 TB
design point is not "store 100 TB in SQLite" but "ingest many
operational SQLite drops in parallel" (one file per partition task,
rowid slices within a file).  The same reader pattern transfers
verbatim to any paginatable store (REST cursors, JDBC-less databases).
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

#: Arrow batch size per yield — small enough to stream, large enough
#: to amortize the per-batch Arrow/IPC overhead.
_BATCH_ROWS = 4096


def _affinity_to_spark(decl: str):
    """Map a SQLite declared type to a Spark type by affinity rules
    (https://www.sqlite.org/datatype3.html §3.1): INT* → long,
    REAL/FLOA/DOUB → double, BLOB → binary, else text."""
    d = (decl or "").upper()
    if "INT" in d:
        return LongType()
    if any(k in d for k in ("REAL", "FLOA", "DOUB", "NUMERIC", "DECIMAL")):
        return DoubleType()
    if "BLOB" in d or d == "":
        return BinaryType()
    return StringType()


def sqlite_table_schema(path: str, table: str) -> StructType:
    """Infer a Spark schema from ``PRAGMA table_info`` (driver-side,
    metadata only)."""
    with sqlite3.connect(path) as conn:
        info = conn.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not info:
        raise ValueError(f"sqlite table not found: {table!r} in {path}")
    fields = [
        StructField(name, _affinity_to_spark(decl), True)
        for (_cid, name, decl, _notnull, _default, _pk) in info
    ]
    return StructType(fields)


@dataclass
class _RowidSlice(InputPartition):
    """A contiguous rowid range [lo, hi] of the table (inclusive)."""

    lo: int
    hi: int


def _compile_filter(f: Filter) -> tuple[str, list] | None:
    """Compile one Spark Filter to (sql_fragment, params), or None if
    unsupported.  Only top-level columns (single-part paths) compile;
    LIKE wildcards in the value are escaped so Contains/StartsWith
    match literally."""
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None
    col = '"%s"' % attr[0].replace('"', '""')
    if isinstance(f, EqualTo):
        return f"{col} = ?", [f.value]
    if isinstance(f, GreaterThan):
        return f"{col} > ?", [f.value]
    if isinstance(f, GreaterThanOrEqual):
        return f"{col} >= ?", [f.value]
    if isinstance(f, LessThan):
        return f"{col} < ?", [f.value]
    if isinstance(f, LessThanOrEqual):
        return f"{col} <= ?", [f.value]
    if isinstance(f, In):
        vals = list(f.value)
        if not vals:
            return "1 = 0", []
        marks = ", ".join("?" for _ in vals)
        return f"{col} IN ({marks})", vals
    if isinstance(f, IsNull):
        return f"{col} IS NULL", []
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL", []
    esc = lambda s: s.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")  # noqa: E731
    if isinstance(f, StringStartsWith):
        return f"{col} LIKE ? ESCAPE '\\'", [esc(f.value) + "%"]
    if isinstance(f, StringEndsWith):
        return f"{col} LIKE ? ESCAPE '\\'", ["%" + esc(f.value)]
    if isinstance(f, StringContains):
        return f"{col} LIKE ? ESCAPE '\\'", ["%" + esc(f.value) + "%"]
    return None


class SQLiteReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options.get("path") or options.get("url")
        if not self.path:
            raise ValueError("sqlite source requires option 'path'")
        self.table = options.get("table") or options.get("dbtable")
        if not self.table:
            raise ValueError("sqlite source requires option 'table'")
        self.schema = schema
        self.num_partitions = int(options.get("numpartitions", "4"))
        self._where: str = ""
        self._params: list = []

    # -- Spark 4.1 filter pushdown -------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        frags, params = [], []
        for f in filters:
            compiled = _compile_filter(f)
            if compiled is None:
                yield f  # not pushed — Spark re-evaluates it
            else:
                frags.append(compiled[0])
                params.extend(compiled[1])
        if frags:
            self._where = " AND ".join(frags)
            self._params = params

    # -- planning -------------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        with sqlite3.connect(self.path) as conn:
            row = conn.execute(
                f'SELECT min(rowid), max(rowid) FROM "{self.table}"'
            ).fetchone()
        lo, hi = row
        if lo is None:  # empty table → one no-op slice
            return [_RowidSlice(0, -1)]
        n = max(1, min(self.num_partitions, hi - lo + 1))
        span = (hi - lo + 1 + n - 1) // n
        return [
            _RowidSlice(lo + i * span, min(hi, lo + (i + 1) * span - 1))
            for i in range(n)
        ]

    # -- execution (one task per rowid slice) ---------------------------
    def read(self, partition: _RowidSlice) -> Iterator[Any]:
        import pyarrow as pa

        cols = ", ".join('"%s"' % f.name for f in self.schema.fields)
        sql = (
            f'SELECT {cols} FROM "{self.table}" '
            f"WHERE rowid BETWEEN ? AND ?"
        )
        params: list = [partition.lo, partition.hi]
        if self._where:
            sql += f" AND ({self._where})"
            params.extend(self._params)
        arrow_fields = []
        for f in self.schema.fields:
            if isinstance(f.dataType, LongType):
                t = pa.int64()
            elif isinstance(f.dataType, DoubleType):
                t = pa.float64()
            elif isinstance(f.dataType, BinaryType):
                t = pa.binary()
            else:
                t = pa.string()
            arrow_fields.append(pa.field(f.name, t))
        arrow_schema = pa.schema(arrow_fields)
        with sqlite3.connect(self.path) as conn:
            cur = conn.execute(sql, params)
            while True:
                rows = cur.fetchmany(_BATCH_ROWS)
                if not rows:
                    break
                columns = list(zip(*rows)) if rows else [[] for _ in arrow_fields]
                yield pa.record_batch(
                    [
                        pa.array(columns[i], type=arrow_fields[i].type)
                        for i in range(len(arrow_fields))
                    ],
                    schema=arrow_schema,
                )


class SQLiteDataSource(DataSource):
    """``spark.read.format("sqlite").option("path", db).option("table", t)``."""

    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self) -> StructType:
        return sqlite_table_schema(
            self.options.get("path") or self.options.get("url"),
            self.options.get("table") or self.options.get("dbtable"),
        )

    def reader(self, schema: StructType) -> SQLiteReader:
        return SQLiteReader(schema, dict(self.options))


def register_sqlite_source(spark: "SparkSession") -> None:
    """Idempotently register the ``sqlite`` format on this session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` — off by
    default in 4.1, and a reader that implements ``pushFilters`` is
    rejected outright when the flag is false."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SQLiteDataSource)
