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
class MicrobatchExecutionStarted(Event):
    """Microbatch batch begins (EXTENSION: dbt 1.9 microbatch
    LogStartBatch shape; this reference snapshot predates it)."""

    CODE = "Q043"
    LEVEL = "debug"
    unique_id: str = ""
    batch_start: str = ""
    batch_end: str = ""
    index: int = 0
    total: int = 0

    def message(self) -> str:
        return (
            f"Batch {self.index} of {self.total} START "
            f"[{self.batch_start} .. {self.batch_end}) {self.unique_id}"
        )


@dataclass
class MicrobatchExecutionCompleted(Event):
    """Microbatch batch finished (LogBatchResult shape)."""

    CODE = "Q044"
    LEVEL = "debug"
    unique_id: str = ""
    batch_start: str = ""
    index: int = 0
    total: int = 0
    execution_time: float = 0.0
    status: str = "success"

    def message(self) -> str:
        word = "OK" if self.status == "success" else "ERROR"
        return (
            f"Batch {self.index} of {self.total} {word} {self.unique_id} "
            f"[{self.execution_time:.2f}s]"
        )


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
class LogTestResult(Event):
    """Q007 (reference ``LogTestResult``, dynamic-level; rendered at
    the result's own severity by the console layer)."""

    CODE = "Q007"
    name: str = ""
    status: str = ""
    index: int = 0
    total: int = 0
    num_failures: int = 0
    execution_time: float = 0.0

    def message(self) -> str:
        if self.status == "error":
            info = "ERROR"
        elif self.status == "pass":
            info = "PASS"
        elif self.status == "warn":
            info = f"WARN {self.num_failures}"
        else:
            info = f"FAIL {self.num_failures}"
        return (
            f"{self.index} of {self.total} {info} {self.name} "
            f"[{self.status.upper()} in {self.execution_time:.2f}s]"
        )


@dataclass
class LogSnapshotResult(Event):
    CODE = "Q015"
    description: str = ""
    status: str = ""
    index: int = 0
    total: int = 0
    execution_time: float = 0.0

    def message(self) -> str:
        info = (
            "ERROR snapshotting" if self.status == "error"
            else "OK snapshotted"
        )
        return (
            f"{self.index} of {self.total} {info} {self.description} "
            f"[{self.status.upper()} in {self.execution_time:.2f}s]"
        )


@dataclass
class LogSeedResult(Event):
    CODE = "Q016"
    schema: str = ""
    relation: str = ""
    status: str = ""
    index: int = 0
    total: int = 0
    execution_time: float = 0.0

    def message(self) -> str:
        info = "ERROR loading" if self.status == "error" else "OK loaded"
        return (
            f"{self.index} of {self.total} {info} seed file "
            f"{self.schema}.{self.relation} "
            f"[{self.status.upper()} in {self.execution_time:.2f}s]"
        )


@dataclass
class LogFreshnessResult(Event):
    CODE = "Q018"
    source_name: str = ""
    table_name: str = ""
    status: str = ""
    index: int = 0
    total: int = 0

    def message(self) -> str:
        info = {
            "runtime error": "ERROR", "error": "ERROR STALE",
            "warn": "WARN",
        }.get(self.status, "PASS")
        return (
            f"{self.index} of {self.total} {info} freshness of "
            f"{self.source_name}.{self.table_name}"
        )


@dataclass
class NodeCompiling(Event):
    CODE = "Q030"
    LEVEL = "debug"
    unique_id: str = ""

    def message(self) -> str:
        return f"Began compiling node {self.unique_id}"


@dataclass
class NodeExecuting(Event):
    CODE = "Q031"
    LEVEL = "debug"
    unique_id: str = ""

    def message(self) -> str:
        return f"Began executing node {self.unique_id}"


@dataclass
class LogHookStartLine(Event):
    CODE = "Q032"
    statement: str = ""
    index: int = 0
    total: int = 0

    def message(self) -> str:
        return (
            f"{self.index} of {self.total} START hook: "
            f"{self.statement} [RUN]"
        )


@dataclass
class LogHookEndLine(Event):
    CODE = "Q033"
    statement: str = ""
    status: str = ""
    index: int = 0
    total: int = 0
    execution_time: float = 0.0

    def message(self) -> str:
        return (
            f"{self.index} of {self.total} OK hook: {self.statement} "
            f"[{self.status.upper()} in {self.execution_time:.2f}s]"
        )


@dataclass
class FoundStats(Event):
    CODE = "W006"
    stat_line: str = ""

    def message(self) -> str:
        return f"Found {self.stat_line}"


@dataclass
class TimingInfoCollected(Event):
    CODE = "Z010"
    LEVEL = "debug"
    unique_id: str = ""
    name: str = ""
    started_at: str = ""
    completed_at: str = ""

    def message(self) -> str:
        return (
            f"Timing info for {self.unique_id} ({self.name}): "
            f"{self.started_at} => {self.completed_at}"
        )


# ------------------------------------------------------------------
# adapter event family: the reference delegates these to the external
# dbt-adapters package; codes mirror that public project's
# events/types.py (SQLQuery E016, SQLQueryStatus E017, CacheAction
# E022) so a log consumer keyed on dbt's codes reads ours unchanged
# ------------------------------------------------------------------

@dataclass
class SQLQuery(Event):
    CODE = "E016"
    LEVEL = "debug"
    conn_name: str = ""
    sql: str = ""

    def message(self) -> str:
        return f'On "{self.conn_name}": {self.sql}'


@dataclass
class SQLQueryStatus(Event):
    CODE = "E017"
    LEVEL = "debug"
    status: str = ""
    elapsed: float = 0.0

    def message(self) -> str:
        return f"SQL status: {self.status} in {self.elapsed:.3f} seconds"


@dataclass
class CacheAction(Event):
    CODE = "E022"
    LEVEL = "debug"
    action: str = ""
    ref_key: str = ""
    ref_key_2: str = ""

    def message(self) -> str:
        if self.action == "rename_relation":
            return (
                f"Renaming relation {self.ref_key} to {self.ref_key_2}"
            )
        if self.action == "drop_relation":
            return f"Dropping relation {self.ref_key}"
        return f"Adding relation {self.ref_key}"


@dataclass
class NoNodesForSelectionCriteria(Event):
    CODE = "M030"
    LEVEL = "warn"
    spec_raw: str = ""

    def message(self) -> str:
        return (f"The selection criterion '{self.spec_raw}' does not "
                "match any enabled nodes")


@dataclass
class RunResultError(Event):
    CODE = "Z024"
    LEVEL = "error"
    msg: str = ""
    unique_id: str = ""

    def message(self) -> str:
        return f"  {self.msg}"


class WarnErrorOptions:
    """``--warn-error-options`` include/exclude/silence semantics
    (reference ``core/dbt/cli/main.py:138`` + ``option_types.py:46-66``):

    - ``include``: ``"all"``/``"*"`` or a list of event names promoted
      from warning to error;
    - ``exclude``: event names kept as warnings even under
      ``include: all`` (exclusion wins over inclusion);
    - ``silence``: event names suppressed entirely (not logged, never
      promoted).

    ``error`` / ``warn`` are accepted aliases for include / exclude,
    matching the reference's ``exclusive_primary_alt_value_setting``.
    """

    @staticmethod
    def _namelist(v) -> list[str]:
        # a scalar string is ONE event name, not an iterable of
        # characters (list("TestWarning") would match nothing and
        # silently disable the user's exclusion)
        if v is None:
            return []
        if isinstance(v, str):
            return [v]
        return list(v)

    def __init__(self, include=None, exclude=None, silence=None):
        if isinstance(include, str) and include.lower() in ("all", "*"):
            self.include: object = include
        else:
            self.include = self._namelist(include)
        self.exclude = self._namelist(exclude)
        self.silence = self._namelist(silence)

    @classmethod
    def from_yaml(cls, text) -> "WarnErrorOptions":
        """Parse the CLI/env YAML string (e.g.
        ``'{"include": "all", "exclude": ["NoNodesForSelectionCriteria"]}'``)
        or an already-parsed mapping (dbt_project.yml ``flags:`` tier)."""
        if not text:
            return cls()
        if isinstance(text, dict):
            raw = text
        else:
            import yaml

            raw = yaml.safe_load(text) or {}
        if not isinstance(raw, dict):
            raise ValueError(
                f"--warn-error-options must be a YAML mapping, got: {text!r}"
            )
        # primary/alt are EXCLUSIVE (reference
        # exclusive_primary_alt_value_setting raises
        # DbtExclusivePropertyUseError when both are set) — silently
        # preferring one would hide half the user's configuration
        for primary, alt in (("include", "error"), ("exclude", "warn")):
            if primary in raw and alt in raw:
                raise ValueError(
                    f"--warn-error-options: only one of {primary!r} or "
                    f"{alt!r} may be set"
                )
        return cls(
            include=raw.get("include", raw.get("error", [])),
            exclude=raw.get("exclude", raw.get("warn", [])),
            silence=raw.get("silence", []),
        )

    def _include_all(self) -> bool:
        return isinstance(self.include, str) and self.include.lower() in (
            "all", "*",
        )

    def silenced(self, name: str) -> bool:
        return name in self.silence

    def includes(self, name: str) -> bool:
        if name in self.silence or name in self.exclude:
            return False
        if self._include_all():
            return True
        return name in self.include


class WarnAsError(Exception):
    """A warning promoted to an error by --warn-error /
    --warn-error-options (reference EventCompilationError shape)."""


class EventManager:
    """Append-only jsonl event log (``logs/dbt.log``), thread-safe —
    runner worker threads fire node events concurrently."""

    def __init__(self, log_dir: str, invocation_id: str):
        self.log_path = os.path.join(log_dir, "dbt.log")
        self.invocation_id = invocation_id
        self._lock = threading.Lock()
        #: blanket --warn-error + granular --warn-error-options; set by
        #: the runner per invocation
        self.warn_error = False
        self.warn_error_options = WarnErrorOptions()
        os.makedirs(log_dir, exist_ok=True)
        # one O_APPEND handle for the manager's lifetime (open+close
        # per event put ~1-2 ms/node back on the orchestration hot
        # path once the r9 lifecycle/adapter codes landed); flush per
        # line keeps the log crash-safe and visible to concurrent
        # readers, and O_APPEND keeps multi-Runner writes atomic
        self._fh = None

    def fire(self, event: Event) -> None:
        from sparkt.secrets import scrub_secrets

        # single choke point for the structured log: no secret value
        # or placeholder ever reaches dbt.log (reference base.py:574)
        line = scrub_secrets(event.to_line(self.invocation_id))
        with self._lock:
            if self._fh is None:
                self._fh = open(self.log_path, "a")
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self) -> None:
        """Release the log handle (a long-lived process constructing
        many Runners must be able to rotate/delete dbt.log); the next
        fire() re-opens in append mode."""
        with self._lock:
            if self._fh is not None:
                self._fh.close()
                self._fh = None

    def __del__(self):  # best-effort: close() is the real API
        try:
            self.close()
        except Exception:
            pass

    def promotes(self, event_name: str) -> bool:
        """True when this warning class must be raised as an error."""
        if self.warn_error_options.silenced(event_name):
            return False
        if self.warn_error and event_name not in self.warn_error_options.exclude:
            return True
        return self.warn_error_options.includes(event_name)

    def warn_or_error(self, event: Event) -> None:
        """Fire a warning-level event, raising instead when its class is
        promoted (reference dbt_common warn_or_error + the
        ``--warn-error-options`` flag)."""
        name = type(event).__name__
        if self.warn_error_options.silenced(name):
            return
        if self.promotes(name):
            raise WarnAsError(f"[{name}] {event.message()}")
        self.fire(event)
