"""Store abstraction — reference store/src/lib.rs:7-28.

``Database`` is the execute/query trait; ``RaftControl`` is the cluster
membership trait (join / remove / leader_id). In the reference these
route to the Raft layer; on Spark the cluster manager owns membership,
so RaftControl degenerates to metadata (SURVEY.md §2 A13/A15) — the
operations succeed and are journaled, but executor topology is Spark's.

The reference's trait asymmetry (Database::query returns one Rows while
DB::query returns Vec<Rows>, SURVEY.md §3) is resolved in favor of the
DB layer: query returns a list, matching dust's own tests.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from dust_spark.model import Request, Response, Rows
from dust_spark.session import DustSession


@runtime_checkable
class Database(Protocol):
    """reference store/src/lib.rs:7-15."""

    def execute(self, req: Request) -> list[Response]: ...

    def query(self, req: Request) -> list[Rows]: ...


class SparkStore:
    """Database + RaftControl over a DustSession.

    Membership ops are metadata no-ops: Spark's cluster manager
    (standalone/YARN/K8s) owns node membership and fault tolerance; the
    'leader' is the driver. We keep the reference's API shape so a dust
    client can speak to us unchanged (store/src/lib.rs:18-28).
    """

    def __init__(self, session: DustSession):
        self.session = session
        self._members: dict[int, str] = {1: "driver"}

    # -- Database ----------------------------------------------------------

    def execute(self, req: Request) -> list[Response]:
        return self.session.execute(req)

    def query(self, req: Request) -> list[Rows]:
        return self.session.query(req)

    # -- RaftControl (store/src/lib.rs:18-28) ------------------------------

    def join(self, node_id: int, address: str) -> None:
        self._members[node_id] = address

    def remove(self, node_id: int) -> None:
        self._members.pop(node_id, None)

    def leader_id(self) -> int:
        return 1  # the Spark driver is always 'leader'

    @property
    def members(self) -> dict[int, str]:
        return dict(self._members)
