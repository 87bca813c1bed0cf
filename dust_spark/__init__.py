"""dust_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hqt/dust (reference: /root/reference).

The reference is an rqlite-style replicated SQLite (statement-based Raft
replication over a SQLite storage engine; see reference README.md:4-6).
Its *capability surface* is (a) a batched, optionally-transactional SQL
execute/query API with a typed JSON result contract (reference
command/src/lib.rs, db/src/db.rs) and (b) the full SQL dialect it
delegates to SQLite. This package re-expresses that surface Spark-first:

- ``dust_spark.session.DustSession`` — the engine: execute/query batches,
  transactions via staged catalog swap, SQLite-compatible constraint
  enforcement, the ``{columns,types,values}`` wire contract.
- ``dust_spark.queries`` — the declared-query catalog (SURVEY.md §2),
  every query paired with a DuckDB oracle for hash-checked correctness.
- ``dust_spark.operators`` — LLM-data-pipeline operators (dedup,
  similarity search, text analysis, as-of join, multimodal columns)
  designed shuffle-aware for 100 TB scale.
- ``dust_spark.streaming`` — Structured Streaming operators (windows,
  watermarks, stateful dedup, stream-static joins).
"""

from dust_spark.model import DataType, Parameter, Request, Response, Rows, Statement
from dust_spark.session import DustSession

__version__ = "0.1.0"

__all__ = [
    "DustSession",
    "Request",
    "Statement",
    "Parameter",
    "Response",
    "Rows",
    "DataType",
    "__version__",
]
