"""Wire/data model: Request / Statement / Parameter / Response / Rows.

Mirrors the reference's command crate (reference command/src/lib.rs:14-75):

- ``Request { transaction: bool, statements: [Statement] }``
- ``Statement { sql: str, parameters: [int|float|str] }``
- ``Response { last_insert_id, rows_affected, error }`` — zero/empty
  fields are skipped in JSON (command/src/lib.rs:32-41).
- ``Rows { columns, types, values }`` — values is a list of rows
  (command/src/lib.rs:43-50); empty results serialize as
  ``{"columns":[],"types":[],"values":[]}`` (db/src/db.rs:427-432).

Type vocabulary is SQLite's five storage classes in lowercase
(command/src/lib.rs:67-75), extended — because our engine is columnar
and typed — with ``timestamp``, ``date``, ``boolean``, ``array``,
``map``, ``struct`` and ``decimal`` where the Spark source type demands
it (SURVEY.md §1.2).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

try:
    from pyspark.sql.types import VariantVal as _VariantVal
except ImportError:  # pragma: no cover - older pyspark
    _VariantVal = None


class DataType:
    """Lowercase type names of the wire contract."""

    NULL = "null"
    INTEGER = "integer"
    REAL = "real"
    TEXT = "text"
    BLOB = "blob"
    # Extensions beyond SQLite's storage classes (SURVEY.md §1.2):
    TIMESTAMP = "timestamp"
    DATE = "date"
    BOOLEAN = "boolean"
    ARRAY = "array"
    MAP = "map"
    STRUCT = "struct"
    DECIMAL = "decimal"


class Parameter:
    """Bind-parameter constructors (reference command/src/lib.rs:25-30:
    Integer/Real/Text). Our engine binds plain Python values; these
    constructors exist for API parity — we additionally allow None and
    bytes, widening the reference's narrower surface."""

    @staticmethod
    def Integer(v: int) -> int:
        return int(v)

    @staticmethod
    def Real(v: float) -> float:
        return float(v)

    @staticmethod
    def Text(v: str) -> str:
        return str(v)


@dataclass
class Statement:
    """One SQL statement with positional ``?`` parameters
    (command/src/lib.rs:20-30). Parameters are int / float / str
    (the reference's Integer/Real/Text; we additionally accept None
    and bytes, fixing the reference's narrower surface)."""

    sql: str
    parameters: list[Any] = field(default_factory=list)


@dataclass
class Request:
    """An ordered statement batch, optionally atomic
    (command/src/lib.rs:14-17)."""

    transaction: bool = False
    statements: list[Statement] = field(default_factory=list)

    @staticmethod
    def single(sql: str, parameters: list[Any] | None = None, transaction: bool = False) -> "Request":
        return Request(transaction=transaction, statements=[Statement(sql, parameters or [])])


@dataclass
class Response:
    """Per-write-statement result (command/src/lib.rs:32-41)."""

    last_insert_id: int = 0
    rows_affected: int = 0
    error: str = ""

    def to_dict(self) -> dict[str, Any]:
        # serde skip_serializing_if: zero/empty fields omitted
        # (command/src/lib.rs:33-39).
        d: dict[str, Any] = {}
        if self.last_insert_id != 0:
            d["last_insert_id"] = self.last_insert_id
        if self.rows_affected != 0:
            d["rows_affected"] = self.rows_affected
        if self.error:
            d["error"] = self.error
        return d


@dataclass
class Rows:
    """A typed result set (command/src/lib.rs:43-50)."""

    columns: list[str] = field(default_factory=list)
    types: list[str] = field(default_factory=list)
    values: list[list[Any]] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {"columns": self.columns, "types": self.types, "values": self.values}


def spark_type_name(dtype: T.DataType) -> str:
    """Spark type → wire type name (SURVEY.md §1.2 mapping table)."""
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return DataType.INTEGER
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return DataType.REAL
    if isinstance(dtype, T.StringType):
        return DataType.TEXT
    if isinstance(dtype, T.BinaryType):
        return DataType.BLOB
    if isinstance(dtype, T.NullType):
        return DataType.NULL
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return DataType.TIMESTAMP
    if isinstance(dtype, T.DateType):
        return DataType.DATE
    if isinstance(dtype, T.BooleanType):
        return DataType.BOOLEAN
    if isinstance(dtype, T.DecimalType):
        # SQLite has no decimal storage class — decimal expressions
        # (Spark parses `7.0` as DECIMAL(2,1)) surface as REAL, like
        # sqlite3 does
        return DataType.REAL
    if isinstance(dtype, T.ArrayType):
        return DataType.ARRAY
    if isinstance(dtype, T.MapType):
        return DataType.MAP
    if isinstance(dtype, T.StructType):
        return DataType.STRUCT
    return DataType.TEXT


def _json_value(v: Any) -> Any:
    """Convert one cell to its JSON wire value (reference
    db/src/db.rs:260-272; we fix the Blob→Null TODO at :268-269 by
    emitting base16 text for bytes)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return 1 if v else 0  # SQLite has no boolean storage class
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return v
    if isinstance(v, _decimal.Decimal):
        # decimal cells ride the REAL wire (str(v) here produced
        # '3.500000'-style text — r6 differential finding)
        return float(v)
    if _VariantVal is not None and isinstance(v, _VariantVal):
        # typed json extraction (r6): scalars keep their json type like
        # SQLite json_extract; containers render as compact json text
        pv = v.toPython()
        if isinstance(pv, (dict, list)):
            return json.dumps(pv, separators=(",", ":"), ensure_ascii=False)
        return _json_value(pv)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_value(x) for k, x in v.items()}
    if hasattr(v, "asDict"):  # pyspark Row
        return {k: _json_value(x) for k, x in v.asDict().items()}
    return str(v)


def rows_from_dataframe(df, collected=None) -> Rows:
    """DataFrame → Rows. Types come from ``df.schema`` (exact — strictly
    better than the reference's first-row sniffing, db/src/db.rs:245-257),
    but an empty result still emits ``[],[],[]`` for wire compatibility
    (db/src/db.rs:427-432)."""
    data = df.collect() if collected is None else collected
    if not data:
        return Rows()
    columns = [f.name for f in df.schema.fields]
    types = [spark_type_name(f.dataType) for f in df.schema.fields]
    values = [[_json_value(v) for v in row] for row in data]
    return Rows(columns=columns, types=types, values=values)


def responses_to_json(responses: list[Response]) -> str:
    return json.dumps([r.to_dict() for r in responses], separators=(",", ":"))


def rows_to_json(rows: list[Rows]) -> str:
    return json.dumps([r.to_dict() for r in rows], separators=(",", ":"))
