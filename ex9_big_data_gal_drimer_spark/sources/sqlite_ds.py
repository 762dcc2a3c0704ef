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

The write side (``df.write.format("sqlite")``) spills each task to a
private temp SQLite file and merges them in the driver-side commit
(the commit-message pattern of a transactional sink), and the stream
side (``spark.readStream.format("sqlite")``) tails the table by rowid
high-water mark with Spark-checkpointed offsets — exactly-once
micro-batches over an append-only operational store.

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
    DataSourceStreamReader,
    DataSourceWriter,
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
    WriterCommitMessage,
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
    metadata only).  View columns built from expressions carry NO
    declared type; those fall back to sampling ``typeof()`` of the
    first non-NULL value (one indexed-free probe per untyped column —
    still metadata-scale)."""
    qtable = '"%s"' % table.replace('"', '""')
    with sqlite3.connect(path) as conn:
        info = conn.execute(f"PRAGMA table_info({qtable})").fetchall()
        if not info:
            raise ValueError(f"sqlite table not found: {table!r} in {path}")
        fields = []
        for _cid, name, decl, _notnull, _default, _pk in info:
            if (decl or "").strip():
                dt = _affinity_to_spark(decl)
            else:
                qcol = '"%s"' % name.replace('"', '""')
                row = conn.execute(
                    f"SELECT typeof({qcol}) FROM {qtable} "
                    f"WHERE {qcol} IS NOT NULL LIMIT 1"
                ).fetchone()
                sampled = row[0] if row else None
                dt = {
                    "integer": LongType(),
                    "real": DoubleType(),
                    "text": StringType(),
                    "blob": BinaryType(),
                }.get(sampled, StringType())
            fields.append(StructField(name, dt, True))
    return StructType(fields)


@dataclass
class _RowidSlice(InputPartition):
    """A contiguous rowid range [lo, hi] of the table (inclusive)."""

    lo: int
    hi: int


@dataclass
class _FullScan(InputPartition):
    """Single-partition fallback for sources with no rowid — WITHOUT
    ROWID tables and views can't be range-partitioned by rowid."""

    reason: str


def _qident(name: str) -> str:
    """Double-quote a SQLite identifier, escaping embedded quotes."""
    return '"%s"' % name.replace('"', '""')


def _arrow_type(dt, col_name: str):
    """Spark type → Arrow type for the scan batches.  Supports the
    types SQLite storage classes can faithfully carry (integers of
    any width, floats, boolean-as-int, text, blob); anything else in
    a USER-SUPPLIED schema (dates, timestamps, arrays, …) raises a
    clear planning-time error instead of an opaque Arrow failure
    mid-scan."""
    import pyarrow as pa

    s = dt.simpleString()
    mapping = {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "binary": pa.binary(),
    }
    if s not in mapping:
        raise ValueError(
            f"sqlite source: unsupported type {s!r} for column "
            f"{col_name!r}; supported: {sorted(mapping)}"
        )
    return mapping[s]


def _compile_filter(f: Filter) -> tuple[str, list] | None:
    """Compile one Spark Filter to (sql_fragment, params), or None if
    unsupported.  Only top-level columns (single-part paths) compile.

    String predicates deliberately AVOID SQLite's LIKE: LIKE is
    case-INSENSITIVE for ASCII, while Spark's startswith / endswith /
    contains are case-sensitive — and a pushed filter is never
    re-evaluated by Spark, so a LIKE translation would silently admit
    wrong-case rows.  substr() / instr() comparisons are
    case-sensitive and need no wildcard escaping at all."""
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None
    col = _qident(attr[0])
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
    if isinstance(f, (StringStartsWith, StringEndsWith, StringContains)):
        if f.value == "":
            # Spark: ''.startswith/endswith/contains is true for any
            # non-null string; SQLite substr/instr disagree on ''
            return f"{col} IS NOT NULL", []
        if isinstance(f, StringStartsWith):
            return f"substr({col}, 1, {len(f.value)}) = ?", [f.value]
        if isinstance(f, StringEndsWith):
            return f"substr({col}, -{len(f.value)}) = ?", [f.value]
        return f"instr({col}, ?) > 0", [f.value]
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
            try:
                row = conn.execute(
                    f"SELECT min(rowid), max(rowid) FROM {_qident(self.table)}"
                ).fetchone()
            except sqlite3.OperationalError as ex:
                # WITHOUT ROWID table: no rowid to slice on → correct
                # single-partition scan instead of a crash
                return [_FullScan(reason=str(ex)[:100])]
            lo, hi = row
            if lo is None:
                # NULL rowid bounds: either an empty table or a VIEW
                # (views answer rowid as NULL instead of erroring) —
                # only the empty case may skip the scan
                has_rows = conn.execute(
                    f"SELECT EXISTS(SELECT 1 FROM {_qident(self.table)})"
                ).fetchone()[0]
                if has_rows:
                    return [_FullScan(reason="null rowid bounds (view)")]
                return [_RowidSlice(0, -1)]
        n = max(1, min(self.num_partitions, hi - lo + 1))
        span = (hi - lo + 1 + n - 1) // n
        return [
            _RowidSlice(lo + i * span, min(hi, lo + (i + 1) * span - 1))
            for i in range(n)
        ]

    # -- execution (one task per rowid slice) ---------------------------
    def read(self, partition: InputPartition) -> Iterator[Any]:
        import pyarrow as pa

        cols = ", ".join(_qident(f.name) for f in self.schema.fields)
        if isinstance(partition, _FullScan):
            sql = f"SELECT {cols} FROM {_qident(self.table)}"
            params: list = []
        else:
            sql = (
                f"SELECT {cols} FROM {_qident(self.table)} "
                f"WHERE rowid BETWEEN ? AND ?"
            )
            params = [partition.lo, partition.hi]
        if self._where:
            glue = " WHERE " if isinstance(partition, _FullScan) else " AND "
            sql += f"{glue}({self._where})"
            params.extend(self._params)
        arrow_fields = [
            pa.field(f.name, _arrow_type(f.dataType, f.name))
            for f in self.schema.fields
        ]
        arrow_schema = pa.schema(arrow_fields)
        with sqlite3.connect(self.path) as conn:
            cur = conn.execute(sql, params)
            while True:
                rows = cur.fetchmany(_BATCH_ROWS)
                if not rows:
                    break
                columns = list(zip(*rows)) if rows else [[] for _ in arrow_fields]
                arrays = []
                for i, af in enumerate(arrow_fields):
                    vals = columns[i]
                    if pa.types.is_boolean(af.type):
                        vals = [None if v is None else bool(v) for v in vals]
                    try:
                        arrays.append(pa.array(vals, type=af.type))
                    except pa.ArrowInvalid as ex:
                        # SQLite's flexible typing permits any value
                        # type in any column; surface WHICH column's
                        # declared affinity the data violated
                        raise ValueError(
                            f"sqlite column {af.name!r} holds a value "
                            f"incompatible with its inferred/declared "
                            f"type {af.type}: {ex}"
                        ) from ex
                yield pa.record_batch(arrays, schema=arrow_schema)


@dataclass
class _TempDbCommit(WriterCommitMessage):
    """One task's spill: path of its temp SQLite file + row count."""

    path: str
    rows: int


def _sqlite_decl(dt) -> str:
    """Spark type → SQLite declared type (affinity round-trips through
    _affinity_to_spark)."""
    s = dt.simpleString()
    if s in ("bigint", "int", "smallint", "tinyint", "boolean"):
        return "INTEGER"
    if s in ("double", "float") or s.startswith("decimal"):
        return "REAL"
    if s == "binary":
        return "BLOB"
    return "TEXT"  # strings, dates, timestamps (ISO text)


def _to_sqlite_value(v):
    import decimal

    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):  # DecimalType rows → REAL storage
        return float(v)
    if hasattr(v, "isoformat"):  # date / datetime
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    return v


class SQLiteWriter(DataSourceWriter):
    """Distributed write into a single-file store: each task spills
    its partition to a private temp SQLite file (no lock contention —
    SQLite serializes concurrent writers to one file), and the
    driver-side ``commit`` merges the spills into a private staging
    table via ``ATTACH`` + ``INSERT INTO … SELECT``, then publishes
    in ONE SQLite transaction (drop + rename for overwrite) — a crash
    mid-commit leaves the original table intact.  The commit is the
    only serial section and touches each row once.

    This is the general commit-message pattern of a transactional
    sink (task spills → atomic driver publish); with SQLite the
    "cluster" caveat is inherent — the target is a one-host serving
    file (the reference's ``small_tables.db`` role), so tasks must
    share a filesystem with the driver, as in local mode."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool) -> None:
        self.path = options.get("path") or options.get("url")
        self.table = options.get("table") or options.get("dbtable")
        if not self.path or not self.table:
            raise ValueError("sqlite sink requires options 'path' and 'table'")
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator) -> _TempDbCommit:
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        tmp = f"{self.path}.spill-{pid}-{uuid.uuid4().hex}"
        cols = ", ".join(
            "%s %s" % (_qident(f.name), _sqlite_decl(f.dataType))
            for f in self.schema.fields
        )
        marks = ", ".join("?" for _ in self.schema.fields)
        n = 0
        try:
            with sqlite3.connect(tmp) as conn:
                conn.execute(f"CREATE TABLE spill ({cols})")
                cur = conn.cursor()
                for row in iterator:
                    cur.execute(
                        f"INSERT INTO spill VALUES ({marks})",
                        tuple(_to_sqlite_value(v) for v in row),
                    )
                    n += 1
        except BaseException:
            # a failed/killed task produces no commit message, so
            # neither commit() nor abort() would ever learn this
            # path — clean the partial spill here or it leaks forever
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        if n == 0:
            os.unlink(tmp)
            return _TempDbCommit(path="", rows=0)
        return _TempDbCommit(path=tmp, rows=n)

    def commit(self, messages) -> None:
        import glob
        import os
        import time
        import uuid

        cols = ", ".join(
            "%s %s" % (_qident(f.name), _sqlite_decl(f.dataType))
            for f in self.schema.fields
        )
        target = _qident(self.table)
        staging_name = f"{self.table}__staging_{uuid.uuid4().hex[:8]}"
        staging = _qident(staging_name)
        # Stage every spill into a private table first; the PUBLISH is
        # then one SQLite transaction (DDL is transactional), so a
        # crash mid-commit leaves the ORIGINAL table intact — never a
        # half-merged target.
        conn = sqlite3.connect(self.path, isolation_level=None)
        live_spills = {m.path for m in messages if m and m.path}
        try:
            # Crash hygiene: a hard kill mid-commit of a PREVIOUS run
            # can orphan a <table>__staging_<hex> table (staged in
            # autocommit) and *.spill-* temp dbs.  Sweep both before
            # staging anew.  Scope: staging sweep is limited to THIS
            # target table (concurrent writes to one SQLite table are
            # unsupported — last-writer-wins like any file sink — but
            # writers to OTHER tables in the same db file must not be
            # touched), and the spill sweep is age-gated so a
            # concurrent writer's seconds-old in-flight spills survive
            # while a crashed run's hours-old residue is reclaimed.
            stale = conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
                " AND name LIKE ? ESCAPE '\\'",
                [self.table.replace("_", r"\_") + r"\_\_staging\_%"],
            ).fetchall()
            for (name,) in stale:
                conn.execute(f"DROP TABLE IF EXISTS {_qident(name)}")
            stale_after = 3600  # seconds
            now = time.time()
            for leftover in glob.glob(glob.escape(self.path) + ".spill-*"):
                if leftover in live_spills:
                    continue
                try:
                    if now - os.path.getmtime(leftover) > stale_after:
                        os.unlink(leftover)
                except OSError:
                    pass
            conn.execute(f"CREATE TABLE {staging} ({cols})")
            for m in messages:
                if not m or not m.path:
                    continue
                conn.execute("ATTACH DATABASE ? AS spill_db", [m.path])
                conn.execute(f"INSERT INTO {staging} SELECT * FROM spill_db.spill")
                conn.execute("DETACH DATABASE spill_db")
            conn.execute("BEGIN IMMEDIATE")
            if self.overwrite:
                conn.execute(f"DROP TABLE IF EXISTS {target}")
                conn.execute(f"ALTER TABLE {staging} RENAME TO {target}")
            else:
                existing = [
                    r[1]
                    for r in conn.execute(
                        f"PRAGMA table_info({target})"
                    ).fetchall()
                ]
                write_cols = [f.name for f in self.schema.fields]
                # SQLite identifiers resolve case-insensitively, so
                # the guard must too — the by-name INSERT below works
                # regardless of the stored casing
                if existing and sorted(c.casefold() for c in existing) != sorted(
                    c.casefold() for c in write_cols
                ):
                    # Appending by position into a differently-shaped
                    # table would silently scramble columns; fail loud.
                    raise ValueError(
                        f"append schema mismatch for {self.table}: "
                        f"table has {existing}, write has {write_cols}"
                    )
                conn.execute(f"CREATE TABLE IF NOT EXISTS {target} ({cols})")
                col_list = ", ".join(_qident(c) for c in write_cols)
                conn.execute(
                    f"INSERT INTO {target} ({col_list}) "
                    f"SELECT {col_list} FROM {staging}"
                )
                conn.execute(f"DROP TABLE {staging}")
            conn.execute("COMMIT")
        except BaseException:
            try:
                conn.execute("ROLLBACK")
            except sqlite3.Error:
                pass
            try:
                conn.execute(f"DROP TABLE IF EXISTS {staging}")
            except sqlite3.Error:
                pass
            raise
        finally:
            conn.close()
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.unlink(m.path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.unlink(m.path)


class SQLiteStreamReader(DataSourceStreamReader):
    """Micro-batch tail of a SQLite table by rowid high-water mark —
    the CDC-ish ingestion pattern for any append-only operational
    store: the offset is ``{"rowid": n}``, ``latestOffset`` advances
    it to the current ``max(rowid)``, and each batch's (start, end]
    range splits into rowid-slice partitions exactly like the batch
    reader.  Offsets are Spark-checkpointed, so a restarted query
    resumes from the committed high-water mark (exactly-once over an
    append-only source).  Deletes/updates are out of scope by
    contract — rowids only grow; a mutable table needs the MERGE
    sink's snapshot-diff feed (operators/merge.py) instead."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options.get("path") or options.get("url")
        self.table = options.get("table") or options.get("dbtable")
        if not self.path or not self.table:
            raise ValueError("sqlite stream requires options 'path' and 'table'")
        self.schema = schema
        self.num_partitions = int(options.get("numpartitions", "4"))
        self.start_rowid = int(options.get("startingrowid", "0"))

    def initialOffset(self) -> dict:
        return {"rowid": self.start_rowid}

    def latestOffset(self) -> dict:
        with sqlite3.connect(self.path) as conn:
            row = conn.execute(
                f"SELECT COALESCE(MAX(rowid), 0) FROM {_qident(self.table)}"
            ).fetchone()
        return {"rowid": max(int(row[0]), self.start_rowid)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["rowid"]) + 1, int(end["rowid"])
        if hi < lo:
            return [_RowidSlice(0, -1)]
        n = max(1, min(self.num_partitions, hi - lo + 1))
        span = (hi - lo + 1 + n - 1) // n
        return [
            _RowidSlice(lo + i * span, min(hi, lo + (i + 1) * span - 1))
            for i in range(n)
        ]

    def read(self, partition: _RowidSlice) -> Iterator[Any]:
        if partition.hi < partition.lo:
            return iter(())
        cols = ", ".join(_qident(f.name) for f in self.schema.fields)
        with sqlite3.connect(self.path) as conn:
            rows = conn.execute(
                f"SELECT {cols} FROM {_qident(self.table)} "
                "WHERE rowid BETWEEN ? AND ?",
                [partition.lo, partition.hi],
            ).fetchall()
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


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

    def writer(self, schema: StructType, overwrite: bool) -> SQLiteWriter:
        return SQLiteWriter(schema, dict(self.options), overwrite)

    def streamReader(self, schema: StructType) -> SQLiteStreamReader:
        return SQLiteStreamReader(schema, dict(self.options))


def register_sqlite_source(spark: "SparkSession") -> None:
    """Idempotently register the ``sqlite`` format on this session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` — off by
    default in 4.1, and a reader that implements ``pushFilters`` is
    rejected outright when the flag is false."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SQLiteDataSource)
