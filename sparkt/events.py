"""Structured events and the ``logs/dbt.log`` file.

Compact analogue of the reference's event system: one dataclass per
event type with the reference's stable event codes
(``core/dbt/events/types.py`` — MainReportVersion A001, LogStartLine
Q011, LogModelResult Q012, NodeStart Q024, NodeFinished Q025,
ConcurrencyLine Q027, SkippingDetails Q034, CommandCompleted Q039,
RunResultError Z024), emitted through an :class:`EventManager` that
writes one JSON line per event to ``logs/dbt.log``
(``core/dbt/events/logging.py`` file logger; the line shape mirrors
dbt's ``{"data": ..., "info": {name, code, level, msg, invocation_id,
pid, thread, ts}}`` json log format) and can render the human console
form via :meth:`Event.message`.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone


@dataclass
class Event:
    CODE = "Z999"
    LEVEL = "info"
    NAME = "Event"

    def message(self) -> str:  # pragma: no cover - overridden
        return self.NAME

    def to_line(self, invocation_id: str) -> str:
        data = asdict(self)
        return json.dumps({
            "data": data,
            "info": {
                "name": type(self).__name__,
                "code": self.CODE,
                "level": self.LEVEL,
                "msg": self.message(),
                "invocation_id": invocation_id,
                "pid": os.getpid(),
                "thread": threading.current_thread().name,
                "ts": datetime.now(timezone.utc).isoformat(),
            },
        }, default=str)


@dataclass
class MainReportVersion(Event):
    CODE = "A001"
    version: str = ""

    def message(self) -> str:
        return f"Running with sparkt {self.version}"


@dataclass
class MainReportArgs(Event):
    CODE = "A002"
    LEVEL = "debug"
    args: dict = field(default_factory=dict)

    def message(self) -> str:
        return f"running sparkt with arguments {self.args}"


@dataclass
class LogStartLine(Event):
    CODE = "Q011"
    description: str = ""
    index: int = 0
    total: int = 0

    def message(self) -> str:
        return f"{self.index} of {self.total} START {self.description} [RUN]"


@dataclass
class LogModelResult(Event):
    CODE = "Q012"
    description: str = ""
    status: str = ""
    index: int = 0
    total: int = 0
    execution_time: float = 0.0

    def message(self) -> str:
        verb = "ERROR creating" if self.status == "error" else "OK created"
        return (
            f"{self.index} of {self.total} {verb} {self.description} "
            f"[{self.status.upper()} in {self.execution_time:.2f}s]"
        )


@dataclass
class NodeStart(Event):
    CODE = "Q024"
    LEVEL = "debug"
    unique_id: str = ""

    def message(self) -> str:
        return f"Began running node {self.unique_id}"


@dataclass
class NodeFinished(Event):
    CODE = "Q025"
    LEVEL = "debug"
    unique_id: str = ""
    status: str = ""
    execution_time: float = 0.0

    def message(self) -> str:
        return f"Finished running node {self.unique_id}"


@dataclass
class ConcurrencyLine(Event):
    CODE = "Q027"
    num_threads: int = 0
    target_name: str = ""

    def message(self) -> str:
        return f"Concurrency: {self.num_threads} threads (target='{self.target_name}')"


@dataclass
class SkippingDetails(Event):
    CODE = "Q034"
    resource_type: str = ""
    unique_id: str = ""
    index: int = 0
    total: int = 0

    def message(self) -> str:
        return f"{self.index} of {self.total} SKIP {self.unique_id} [SKIP]"


@dataclass
class CommandCompleted(Event):
    CODE = "Q039"
    LEVEL = "debug"
    command: str = ""
    success: bool = False
    elapsed: float = 0.0

    def message(self) -> str:
        status = "succeeded" if self.success else "failed"
        return f"Command `{self.command}` {status} at elapsed {self.elapsed:.2f}s"


@dataclass
class RunResultError(Event):
    CODE = "Z024"
    LEVEL = "error"
    msg: str = ""
    unique_id: str = ""

    def message(self) -> str:
        return f"  {self.msg}"


class EventManager:
    """Append-only jsonl event log (``logs/dbt.log``), thread-safe —
    runner worker threads fire node events concurrently."""

    def __init__(self, log_dir: str, invocation_id: str):
        self.log_path = os.path.join(log_dir, "dbt.log")
        self.invocation_id = invocation_id
        self._lock = threading.Lock()
        os.makedirs(log_dir, exist_ok=True)

    def fire(self, event: Event) -> None:
        line = event.to_line(self.invocation_id)
        with self._lock, open(self.log_path, "a") as f:
            f.write(line + "\n")
