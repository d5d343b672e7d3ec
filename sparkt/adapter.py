"""SparkAdapter: the single warehouse façade.

Implements the ~25-method adapter contract the reference's core consumes
(SURVEY.md §2.4; call sites ``core/dbt/task/run.py:258-296``,
``core/dbt/task/runnable.py:345-360``) over one ``SparkSession``.

Storage model (no Delta/Hive available in this build, and by design the
layer is pluggable):

- Sources and seeds/tables are **external parquet tables** in Spark's
  session catalog; every (re)write lands in a fresh versioned directory
  ``<warehouse>/<schema>/<identifier>/v<N>`` and the catalog entry is
  swapped via tmp-table + DROP + RENAME. This gives atomic
  replace-while-reading semantics without table formats — the analogue
  of the reference's transactional CTAS (SURVEY.md §7 "Mutation without
  transactions"). On a production cluster the same interface binds to
  Delta/Iceberg (`CREATE OR REPLACE TABLE`, `MERGE INTO`) — the
  materializations only talk to this façade.
- Views are catalog views (`CREATE OR REPLACE VIEW`).

Thread-safety: many scheduler threads share the session (Spark is
thread-safe); catalog DDL is serialized with a lock, mirroring the
reference's relation-cache locking (SURVEY.md §7 "Concurrency").
"""

from __future__ import annotations

import os
import re
import shutil
import threading
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from sparkt.relation import Relation


def _sql_str(spark: SparkSession, v) -> str:
    """Escape ``v`` for embedding in a single-quoted Spark SQL string
    literal. Quotes are doubled (``''``), which Spark parses identically
    whether ``spark.sql.parser.escapedStringLiterals`` is true or false;
    literal backslashes are doubled only under the default (false)
    setting, where backslash acts as an escape character."""
    s = str(v)
    raw = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    if str(raw).lower() != "true":
        s = s.replace("\\", "\\\\")
    return s.replace("'", "''")


def _is_pure_query(sql: str) -> bool:
    """True for statements that are lazy under ``spark.sql`` (plain
    queries) — these need an explicit action in non-fetch execute().
    DDL/DML keywords run eagerly and must NOT be re-executed. Leading
    ``--`` and ``/* */`` comments are skipped with the compilation
    module's scanner (second-opinion review #3: a '-- note' line
    before the SELECT made this return False and the validating query
    silently never ran)."""
    from sparkt.compilation import _skip_leading_comments

    body = sql[_skip_leading_comments(sql):].lstrip().lstrip("(")
    head = body.split(None, 1)
    first = head[0].upper() if head else ""
    return first in ("SELECT", "WITH", "VALUES", "TABLE", "FROM")


@dataclass
class ExecuteResult:
    """Driver-side result set (the reference's agate table analogue,
    ``core/dbt/context/providers.py:884-899``). Small results only."""

    column_names: list[str] = field(default_factory=list)
    rows: list = field(default_factory=list)
    rows_affected: int = -1

    def __iter__(self):
        return iter(self.rows)

    def __len__(self):
        return len(self.rows)


class SparkAdapter:
    type_name = "spark"

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        from sparkt.sources import ensure_runtime_conf

        self.spark = spark
        # Driver-provided sessions lack our defaults; without
        # partitionOverwriteMode=dynamic, INSERT OVERWRITE on a
        # partitioned table replaces the whole table (data loss).
        ensure_runtime_conf(spark)
        self.warehouse_dir = warehouse_dir
        self._ddl_lock = threading.RLock()
        # serializes models that carry spark_session_conf overrides
        # (pre_model_hook → post_model_hook); see pre_model_hook
        self._session_conf_lock = threading.RLock()
        os.makedirs(warehouse_dir, exist_ok=True)
        self._catalog_path = os.path.join(warehouse_dir, "catalog.json")
        self._catalog: dict[str, dict] = {}
        self._restoring = False
        # per-thread query-comment state, created ONCE here — lazy
        # creation raced when two workers hit their first node
        # simultaneously (loser's comment landed on a discarded object)
        self._query_header = threading.local()
        self._restore_catalog()

    # ----------------------------------------------- persistent catalog
    # Spark's in-memory session catalog dies with the process; the engine
    # keeps its own durable record (the reference leans on a persistent
    # warehouse for the same continuity). On a Hive/Delta deployment this
    # replay is unnecessary and disabled by the catalog itself surviving.
    def _save_catalog(self) -> None:
        import json

        if self._restoring:
            return
        if getattr(self, "_defer_saves", False):
            self._catalog_dirty = True
            return
        self._catalog_dirty = False
        tmp = self._catalog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._catalog, f, indent=1)
        os.replace(tmp, self._catalog_path)

    @contextmanager
    def defer_catalog_saves(self):
        """Batch catalog.json persistence across a run: each DDL op
        otherwise rewrites the file (open+truncate measured ~19 ms on
        this filesystem — 4.3 s of a 200-view run, r4 profile). One
        atomic write lands on exit, success or failure; a hard kill
        mid-run loses the run's catalog delta, which is acceptable
        because a killed run's results are replayed anyway."""
        self._defer_saves = True
        try:
            yield
        finally:
            self._defer_saves = False
            if getattr(self, "_catalog_dirty", False):
                self._save_catalog()

    def _record(self, relation: Relation, obj_type: str | None = None,
                **entry) -> None:
        key = f"{relation.schema}.{relation.identifier}"
        self._catalog.pop(key, None)  # re-insert to keep dependency order
        self._catalog[key] = entry
        self._save_catalog()
        self._fire_cache("add_relation", key)
        # keep the lazy per-schema listing (see _cached_relation_type)
        # in sync with the real object type: views record "view",
        # everything else is a table unless the caller says otherwise
        # (external sources may be a repair VIEW)
        listing = getattr(self, "_listing", {}).get(relation.schema)
        if listing is not None:
            t = obj_type or ("view" if entry.get("kind") == "view" else "table")
            listing[relation.identifier] = t

    def _fire_cache(self, action: str, ref_key: str,
                    ref_key_2: str = "") -> None:
        events = getattr(self, "events", None)
        if events is not None:
            from sparkt.events import CacheAction

            events.fire(CacheAction(
                action=action, ref_key=ref_key, ref_key_2=ref_key_2,
            ))

    def _unrecord(self, relation: Relation) -> None:
        self._catalog.pop(f"{relation.schema}.{relation.identifier}", None)
        self._save_catalog()
        self._fire_cache(
            "drop_relation", f"{relation.schema}.{relation.identifier}"
        )
        listing = getattr(self, "_listing", {}).get(relation.schema)
        if listing is not None:
            listing.pop(relation.identifier, None)

    def _cached_relation_type(self, schema: str, identifier: str) -> str | None:
        """Object type from a lazily-built per-schema listing — ONE
        ``listTables`` JVM roundtrip per schema instead of one
        ``getTable`` probe per node (200 serialized probes ≈ 2.5 s of
        a 200-view run, r4 profile). Kept in sync by
        ``_record``/``_unrecord``/``rename_relation``/``drop_schema``;
        external catalog mutations made outside this adapter are
        invisible to it (same assumption as dbt's relation cache)."""
        if not hasattr(self, "_listing"):
            self._listing = {}
        listing = self._listing.get(schema)
        if listing is None:
            listing = {r.identifier: r.type for r in self.list_relations(schema)}
            self._listing[schema] = listing
        return listing.get(identifier)

    def _restore_catalog(self) -> None:
        import json

        if not os.path.exists(self._catalog_path):
            return
        with open(self._catalog_path) as f:
            self._catalog = json.load(f)
        self._restoring = True
        try:
            # FIXPOINT replay: catalog.json's insertion order is NOT a
            # dependency order (recreating a relation re-inserts it at
            # the end, so a selective re-run can move a parent view
            # AFTER its dependents). Replay in rounds, retrying entries
            # whose dependencies may appear later; only entries that
            # still fail once a full round makes no progress are truly
            # stale and get dropped.
            pending = list(self._catalog.items())
            while pending:
                failed: list[tuple[str, dict]] = []
                for key, entry in pending:
                    schema, _, identifier = key.partition(".")
                    rel = Relation(
                        schema=schema,
                        identifier=identifier,
                        type="view" if entry["kind"] == "view" else "table",
                    )
                    try:
                        if self.relation_exists(rel):
                            continue
                        if entry["kind"] == "external":
                            self.register_external_table(
                                rel, entry["path"],
                                fmt=entry.get("fmt", "parquet"),
                                options=entry.get("options") or None,
                            )
                        elif entry["kind"] == "table":
                            self.create_schema(schema)
                            buck = self._bucket_clause(
                                entry.get("bucket_by"), entry.get("buckets"),
                                entry.get("sort_by"),
                            )
                            cols = (
                                f" ({entry['schema_ddl']})"
                                if buck and entry.get("schema_ddl") else ""
                            )
                            self.spark.sql(
                                f"CREATE TABLE {rel.render()}{cols} USING "
                                f"parquet{buck} "
                                f"LOCATION "
                                f"'{_sql_str(self.spark, entry['location'])}'"
                            )
                            # A partitioned location needs explicit
                            # partition recovery in the in-memory catalog,
                            # else the restored table scans 0 rows.
                            if entry.get("partitioned"):
                                self.spark.sql(
                                    f"ALTER TABLE {rel.render()} "
                                    "RECOVER PARTITIONS"
                                )
                        elif entry["kind"] == "view":
                            self.create_view_as(rel, entry["sql"])
                        elif entry["kind"] == "clone":
                            # re-emit the zero-copy clone (delta-only,
                            # like the original statement; on a
                            # non-delta session this fails and the
                            # entry is dropped as stale, explicitly)
                            from sparkt.sqlcheck import (
                                check_shallow_clone,
                            )

                            self.create_schema(schema)
                            self.execute(check_shallow_clone(
                                f"CREATE OR REPLACE TABLE "
                                f"{rel.render()} SHALLOW CLONE "
                                f"{entry['cloned_from']}"
                            ))
                    except Exception:  # noqa: BLE001 — retry next round
                        failed.append((key, entry))
                if len(failed) == len(pending):  # no progress: stale
                    for key, _ in failed:
                        self._catalog.pop(key, None)
                    break
                pending = failed
        finally:
            self._restoring = False

    # ------------------------------------------- connection lifecycle
    # The reference's adapter contract is connection-oriented
    # (``core/dbt/task/runnable.py:345-360`` wraps every node in
    # ``connection_named``; SQL adapters open/commit per node). Spark has
    # ONE session shared by every scheduler thread and no transactions,
    # so these are documented no-ops — kept so orchestration code written
    # against the reference contract runs unchanged.
    def type(self) -> str:  # noqa: A003 — contract name
        return self.type_name

    @contextmanager
    def connection_named(self, name: str):
        yield self

    def clear_transaction(self) -> None:
        pass

    def commit_if_has_connection(self) -> None:
        pass

    def is_cancelable(self) -> bool:
        return True

    def cancel_open_connections(self) -> None:
        """Cancel all in-flight Spark jobs (ctrl-C path,
        ``core/dbt/task/runnable.py`` cancellation)."""
        self.spark.sparkContext.cancelAllJobs()

    def supports(self, capability: str) -> bool:
        """Capability probe (reference ``adapter.supports(Capability.X)``)."""
        return capability in {
            "TableLastModifiedMetadata",       # file-mtime freshness
            "TableLastModifiedMetadataBatch",
            "SchemaMetadataByRelations",
        }

    def pre_model_hook(self, config: dict) -> dict:
        """Per-node session prep hook. Spark analogue: apply per-model
        session overrides (e.g. ``spark.sql.shuffle.partitions``) from
        ``config['spark_session_conf']``; returns the previous values for
        ``post_model_hook`` to restore.

        Models CARRYING overrides serialize on a lock held until their
        post hook (r12 adapter review #3): session conf is global, so
        two concurrent overriders of the same key would snapshot each
        other's values as 'prev' and the restore would wedge the wrong
        default permanently. Models without overrides don't take the
        lock (and may still observe an overrider's conf while it runs
        — the documented shared-session limitation; isolate via
        threads=1 or per-worker sessions)."""
        overrides = config.get("spark_session_conf") or {}
        if not overrides:
            return {}
        self._session_conf_lock.acquire()
        prev: dict[str, str] = {}
        try:
            for k, v in overrides.items():
                try:
                    prev[k] = self.spark.conf.get(k)
                except Exception:  # noqa: BLE001 — unset key
                    prev[k] = None
                self.spark.conf.set(k, str(v))
        except BaseException:
            self._session_conf_lock.release()
            raise
        return prev

    def post_model_hook(self, config: dict, context: dict) -> None:
        # keyed on the returned STATE, not config: pre returns a
        # non-empty prev-map exactly when it applied overrides (and
        # took the lock)
        if not context:
            return
        try:
            for k, v in context.items():
                if v is None:
                    self.spark.conf.unset(k)
                else:
                    self.spark.conf.set(k, v)
        finally:
            self._session_conf_lock.release()

    # ------------------------------------------------- relations cache
    def set_relations_cache(self, relations: list[Relation]) -> None:
        """Warm the relations cache at run start
        (``core/dbt/task/runnable.py`` → ``_get_deferred_manifest`` /
        cache population); avoids per-node catalog listings."""
        self._relations_cache = {
            (r.schema, r.identifier) for r in relations
        }

    def cache_added(self, relation: Relation) -> None:
        getattr(self, "_relations_cache", set()).add(
            (relation.schema, relation.identifier)
        )

    def list_relations_without_caching(self, schema: str) -> list[Relation]:
        return self.list_relations(schema)

    # ------------------------------------------------------------------ exec
    # ---------------------------------------------------- query comment
    def set_query_header(self, comment: str | None, append: bool = False) -> None:
        """Per-node query attribution (reference query_comment,
        ``core/dbt/config/project.py:211-240``): the rendered comment is
        attached to every submitted statement AND becomes the Spark job
        description, so the Spark UI groups this thread's jobs under the
        node. Thread-local — worker threads run different nodes
        concurrently, and ``setJobDescription`` is itself a thread-local
        scheduler property."""
        state = self._query_header
        state.comment = comment
        state.append = append
        try:
            self.spark.sparkContext.setJobDescription(comment)
        except Exception:  # noqa: BLE001 — no sparkContext (Connect)
            pass

    def _commented(self, sql: str) -> str:
        state = getattr(self, "_query_header", None)
        comment = getattr(state, "comment", None) if state else None
        if not comment:
            return sql
        block = "/* {} */".format(comment.replace("*/", "* /"))
        if getattr(state, "append", False):
            return f"{sql}\n{block}"
        return f"{block}\n{sql}"

    def execute(self, sql: str, fetch: bool = False) -> tuple[str, ExecuteResult]:
        """Run one SQL statement; optionally fetch rows to the driver."""
        events = getattr(self, "events", None)
        if events is not None:
            from sparkt.events import SQLQuery

            events.fire(SQLQuery(conn_name="spark", sql=sql))
        t0 = time.time()
        try:
            df = self.spark.sql(self._commented(sql))
            if fetch:
                rows = df.collect()
                result = "OK", ExecuteResult(
                    column_names=list(df.columns), rows=rows,
                    rows_affected=len(rows),
                )
            else:
                # DDL/DML executes eagerly inside .sql(); a pure
                # SELECT is lazy, so a non-fetch query (a validating
                # hook like SELECT assert_true(...)) needs an explicit
                # action or it silently never runs (r12 adapter review
                # #6). The noop sink executes the full query without
                # collecting anything to the driver.
                if _is_pure_query(sql):
                    df.write.format("noop").mode("overwrite").save()
                result = "OK", ExecuteResult(column_names=list(df.columns))
        except Exception:
            # a failed statement still terminates its E016 with a
            # status line (dbt-adapters E016→E017 pairing holds on
            # both outcomes)
            if events is not None:
                from sparkt.events import SQLQueryStatus

                events.fire(SQLQueryStatus(
                    status="ERROR", elapsed=time.time() - t0,
                ))
            raise
        if events is not None:
            from sparkt.events import SQLQueryStatus

            events.fire(SQLQueryStatus(
                status="OK", elapsed=time.time() - t0,
            ))
        return result

    def sql_df(self, sql: str) -> DataFrame:
        return self.spark.sql(self._commented(sql))

    def quote(self, identifier: str) -> str:
        from sparkt.relation import quote_identifier

        return quote_identifier(identifier)

    # --------------------------------------------------------------- schemas
    def create_schema(self, schema: str) -> None:
        # memoized: every materialization ensures its schema, which at
        # 200 nodes was 200 serialized CREATE DATABASE IF NOT EXISTS
        # JVM roundtrips under the DDL lock (~12 ms each, r4 profile)
        ensured = getattr(self, "_schemas_ensured", None)
        if ensured is None:
            ensured = self._schemas_ensured = set()
        if schema in ensured:
            return
        with self._ddl_lock:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.quote(schema)}")
            ensured.add(schema)

    def drop_schema(self, schema: str) -> None:
        getattr(self, "_schemas_ensured", set()).discard(schema)
        getattr(self, "_listing", {}).pop(schema, None)
        with self._ddl_lock:
            self.spark.sql(
                f"DROP DATABASE IF EXISTS {self.quote(schema)} CASCADE"
            )
            shutil.rmtree(os.path.join(self.warehouse_dir, schema), ignore_errors=True)
            for key in [k for k in self._catalog if k.startswith(schema + ".")]:
                self._catalog.pop(key, None)
            self._save_catalog()

    def list_schemas(self) -> list[str]:
        return [d.name for d in self.spark.catalog.listDatabases()]

    # --------------------------------------------- durable relation meta
    def set_relation_meta(self, relation: Relation, **meta) -> None:
        """Annotate the DURABLE catalog entry (catalog.json) for a
        relation — survives process restarts, unlike TBLPROPERTIES on
        the in-memory Spark catalog, which _restore_catalog's CREATE
        TABLE does not re-apply (second-opinion review #2: the MV
        on_configuration_change hash must persist across CLI
        invocations)."""
        key = f"{relation.schema}.{relation.identifier}"
        entry = self._catalog.get(key)
        if entry is None:
            return
        entry.setdefault("meta", {}).update(meta)
        self._save_catalog()

    def get_relation_meta(self, relation: Relation) -> dict:
        entry = (
            self._catalog.get(
                f"{relation.schema}.{relation.identifier}"
            )
            or {}
        )
        return dict(entry.get("meta") or {})

    # -------------------------------------------------------------- catalog
    def get_relation(self, schema: str, identifier: str) -> Relation | None:
        try:
            # QUOTED probe (r12 adapter review #1): the DDL path quotes
            # reserved-word names, so the catalog probe must too —
            # unquoted getTable('s.order') parse-errors and the
            # existing table looked permanently absent
            tbl = self.spark.catalog.getTable(
                f"{self.quote(schema)}.{self.quote(identifier)}"
            )
        except Exception:
            return None
        rel_type = "view" if tbl.tableType == "VIEW" else "table"
        return Relation(schema=schema, identifier=identifier, type=rel_type)

    def list_relations(self, schema: str) -> list[Relation]:
        if not self.spark.catalog.databaseExists(schema):
            return []
        out = []
        for t in self.spark.catalog.listTables(schema):
            if t.isTemporary:
                continue
            out.append(
                Relation(
                    schema=schema,
                    identifier=t.name,
                    type="view" if t.tableType == "VIEW" else "table",
                )
            )
        return out

    def get_columns_in_relation(self, relation: Relation) -> list[tuple[str, str]]:
        df = self.spark.table(relation.render())
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]

    def relation_exists(self, relation: Relation) -> bool:
        return self.get_relation(relation.schema, relation.identifier) is not None

    def partition_columns(self, relation: Relation) -> list[str]:
        """Partition column names of a catalog table ([] if unpartitioned)."""
        try:
            cols = self.spark.catalog.listColumns(relation.render())
        except Exception:
            return []
        return [c.name for c in cols if c.isPartition]

    # ---------------------------------------------------------------- paths
    def _new_location(self, relation: Relation) -> str:
        base = os.path.join(self.warehouse_dir, relation.schema, relation.identifier)
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, f"v{int(time.time() * 1000)}_{uuid.uuid4().hex[:6]}")

    def _gc_old_versions(self, relation: Relation, keep: str) -> None:
        """Deferred GC: retain the current version AND the newest
        previous one; older versions are removed on the NEXT write.

        A reader that resolved the old location just before the catalog
        swap can still finish its scan — files only disappear one full
        write cycle later (the same grace Delta/Iceberg gets from
        retention-windowed VACUUM)."""
        base = os.path.join(self.warehouse_dir, relation.schema, relation.identifier)
        if not os.path.isdir(base):
            return
        others = sorted(
            d
            for d in os.listdir(base)
            if os.path.join(base, d) != keep
            and os.path.isdir(os.path.join(base, d))
        )
        # version dirs are v<epoch_millis>_<hex>: lexicographic ==
        # chronological; drop all but the newest previous version
        for d in others[:-1]:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    # ------------------------------------------------------------------ DDL
    def register_external_table(
        self,
        relation: Relation,
        path: str,
        fmt: str = "parquet",
        options: dict | None = None,
    ) -> None:
        """Zero-copy: point a catalog table at existing files (sources).
        ``fmt`` is any Spark DataSource (parquet/csv/json/orc/text);
        ``options`` pass through as table OPTIONS (csv header,
        delimiter, json multiLine, ...). Reference surface:
        ExternalTable.file_format,
        ``core/dbt/artifacts/resources/v1/source_definition.py:25-60``.

        Nanosecond-timestamp parquet columns (unreadable by Spark
        natively) are repaired through a ``<name>__raw`` table +
        casting view — see ``sparkt/sources.py``.
        """
        from sparkt.sources import ns_fix_exprs, ns_timestamp_columns

        fmt = (fmt or "parquet").lower()
        if fmt == "csv":
            # header+inferSchema default on: seeds-parity ergonomics
            options = {"header": "true", "inferSchema": "true",
                       **(options or {})}
        # keys must be identifiers and values are quote-escaped so csv
        # quote/escape chars (e.g. quote: "'") can't break out of the DDL
        if options:
            for k in options:
                if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", str(k)):
                    raise ValueError(f"invalid table OPTION key: {k!r}")

            opt_clause = " OPTIONS (" + ", ".join(
                f"{k} '{_sql_str(self.spark, v)}'" for k, v in options.items()
            ) + ")"
        else:
            opt_clause = ""
        with self._ddl_lock:
            self.create_schema(relation.schema)
            if self.relation_exists(relation):
                return
            ns_cols = ns_timestamp_columns(path) if fmt == "parquet" else ()
            if not ns_cols:
                self.spark.sql(
                    f"CREATE TABLE {relation.render()} USING {fmt}"
                    f"{opt_clause} LOCATION '{_sql_str(self.spark, path)}'"
                )
                self._record(relation, kind="external", path=path, fmt=fmt,
                             options=options or {})
                return
            raw = relation.with_suffix("__raw")
            if not self.relation_exists(raw):
                # user OPTIONS apply to the raw table too (r12 adapter
                # review #8 — the ns path silently dropped e.g.
                # mergeSchema/recursiveFileLookup)
                self.spark.sql(
                    f"CREATE TABLE {raw.render()} USING parquet"
                    f"{opt_clause} LOCATION '{_sql_str(self.spark, path)}'"
                )
            cols = [f.name for f in self.spark.table(raw.render()).schema.fields]
            exprs = ", ".join(ns_fix_exprs(cols, ns_cols))
            self.spark.sql(
                f"CREATE OR REPLACE VIEW {relation.render()} AS "
                f"SELECT {exprs} FROM {raw.render()}"
            )
            # options persist so a catalog restore re-applies them
            self._record(relation, obj_type="view",
                         kind="external", path=path, fmt="parquet",
                         options=options or {})

    def create_view_as(self, relation: Relation, select_sql: str) -> None:
        self.create_schema(relation.schema)
        with self._ddl_lock:
            # the pre-drop matters only when a non-view occupies the
            # name (CREATE OR REPLACE VIEW cannot replace a table).
            # The managed catalog answers that without a JVM getTable
            # roundtrip (~12 ms, serialized under this lock) — only an
            # unknown name pays the probe.
            existing_type = self._cached_relation_type(
                relation.schema, relation.identifier
            )
            if existing_type == "table":
                self.drop_relation(
                    Relation(schema=relation.schema,
                             identifier=relation.identifier, type="table")
                )
            self.spark.sql(
                f"CREATE OR REPLACE VIEW {relation.render()} AS {select_sql}"
            )
            self._record(relation, kind="view", sql=select_sql)

    @staticmethod
    def _bucket_clause(
        bucket_by: list[str] | None, buckets: int | None,
        sort_by: list[str] | None,
    ) -> str:
        if not bucket_by:
            return ""
        sort = f" SORTED BY ({', '.join(sort_by)})" if sort_by else ""
        return (
            f" CLUSTERED BY ({', '.join(bucket_by)}){sort} "
            f"INTO {int(buckets or 8)} BUCKETS"
        )

    def create_table_as(
        self,
        relation: Relation,
        select_sql: str | None = None,
        df: DataFrame | None = None,
        partition_by: list[str] | None = None,
        bucket_by: list[str] | None = None,
        buckets: int | None = None,
        sort_by: list[str] | None = None,
    ) -> None:
        """Atomic CTAS-replace: write new version dir, swap catalog entry.

        Safe even when ``select_sql`` reads from ``relation`` itself (the
        old files are only dropped after the new ones are fully written),
        which the incremental/snapshot rewrite paths rely on.

        ``bucket_by``/``buckets``/``sort_by`` hash-bucket the table on
        write (Spark ``CLUSTERED BY ... INTO n BUCKETS``): two tables
        bucketed the same way join WITHOUT a shuffle — the co-located
        join path for repeated large joins at 100 TB.
        """
        assert (select_sql is None) != (df is None)
        loc = self._new_location(relation)
        part = (
            f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
        )
        buck = self._bucket_clause(bucket_by, buckets, sort_by)
        tmp = relation.incorporate(
            identifier=f"{relation.identifier}__sparkt_tmp_{uuid.uuid4().hex[:6]}"
        )
        if df is not None and not bucket_by:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(loc)
        with self._ddl_lock:
            self.create_schema(relation.schema)
            if df is not None and bucket_by:
                # bucketed writes go through saveAsTable (bucket spec
                # lives in the catalog, bucket-id file naming on disk)
                writer = (
                    df.write.mode("overwrite").format("parquet")
                    .option("path", loc)
                    .bucketBy(int(buckets or 8), *bucket_by)
                )
                if sort_by:
                    writer = writer.sortBy(*sort_by)
                if partition_by:
                    writer = writer.partitionBy(*partition_by)
                writer.saveAsTable(tmp.render())
            elif df is not None:
                self.spark.sql(
                    f"CREATE TABLE {tmp.render()} USING parquet "
                    f"LOCATION '{_sql_str(self.spark, loc)}'"
                )
                if partition_by:
                    # in-memory catalog doesn't auto-track partitions of a
                    # location-registered table (scan would see 0 rows)
                    self.spark.sql(
                        f"ALTER TABLE {tmp.render()} RECOVER PARTITIONS"
                    )
            else:
                self.spark.sql(
                    f"CREATE TABLE {tmp.render()} USING parquet{part}{buck} "
                    f"LOCATION '{_sql_str(self.spark, loc)}' AS {select_sql}"
                )
            # replaying a bucketed table needs an explicit column list
            # (Spark refuses CLUSTERED BY on schema-inferred CREATE)
            schema_ddl = (
                self.spark.table(tmp.render()).schema.toDDL()
                if bucket_by else None
            )
            existing = self.get_relation(relation.schema, relation.identifier)
            if existing is not None:
                self.drop_relation(existing)
            self.rename_relation(tmp, relation)
            self._record(
                relation,
                kind="table",
                location=loc,
                partitioned=bool(partition_by),
                bucket_by=bucket_by or None,
                buckets=int(buckets or 8) if bucket_by else None,
                sort_by=sort_by or None,
                schema_ddl=schema_ddl,
            )
        self._gc_old_versions(relation, keep=loc)

    def create_seed(
        self,
        relation: Relation,
        path: str,
        delimiter: str = ",",
        column_types: dict | None = None,
        sample: bool = False,
    ) -> dict:
        """Seed CSV → table as ONE adapter call, returning a
        serializable summary ({count, columns, rows}) so a
        record/replay bundle can serve seeds without a session
        (sparkt/record.py; reference ``tests/functional/record/``).
        Agate-like inference: header on, inferSchema, dates preferred,
        empty string → NULL (SURVEY.md §7).

        count and the opt-in ``sample`` rows (≤1000, recording runs
        only — the flag rides the recorded key so replay matches) read
        from the WRITTEN table, not the CSV: the parquet count is
        footer-stats cheap and the CSV is scanned exactly once."""
        reader = (
            self.spark.read.option("header", True)
            .option("delimiter", delimiter)
            .option("inferSchema", True)
            .option("preferDate", True)
            .option("nullValue", "")
            .option("emptyValue", "")
        )
        df = reader.csv(path)
        for col, dtype in (column_types or {}).items():
            if col in df.columns:
                df = df.withColumn(col, df[col].cast(dtype))
        self.create_table_as(relation, df=df)
        written = self.spark.table(relation.render())
        return {
            "count": written.count(),
            "columns": [[f.name, f.dataType.simpleString()]
                        for f in df.schema.fields],
            "rows": (
                [r.asDict() for r in written.limit(1000).collect()]
                if sample else []
            ),
        }

    def stash_python_model_source(self, unique_id: str, columns) -> None:
        """Per-INSTANCE stash feeding python_model_source: set via this
        un-recorded call so the recorded call's KEY is the uid alone —
        replay reproduces the key without knowing the schema."""
        if "_py_src_stash" not in self.__dict__:
            self._py_src_stash: dict = {}
        self._py_src_stash[unique_id] = columns

    def python_model_source(self, unique_id: str) -> dict:
        """Echo of an incremental python model's SOURCE DataFrame
        schema, recorded into the support bundle: replay reads it to
        drive on_schema_change/strategy SQL generation identically,
        with no session and no user-code re-run (sparkt/record.py)."""
        return {
            "columns": getattr(self, "_py_src_stash", {}).get(unique_id)
        }

    def python_model_result(self, relation_name: str) -> dict:
        """Schema + count + row sample of a materialized python model's
        relation — recorded into the support bundle so replay can
        describe the model's output without re-running user code
        against a session (sparkt/record.py)."""
        df = self.spark.table(relation_name)
        return {
            "count": df.count(),
            "columns": [[f.name, f.dataType.simpleString()]
                        for f in df.schema.fields],
            "sample": [r.asDict() for r in df.limit(10).collect()],
        }

    def shallow_clone(self, target: Relation, source_name: str) -> None:
        """Delta zero-copy clone (reference ``core/dbt/task/clone.py:18-126``
        + public dbt-spark ``spark__can_clone_table``: delta only):
        ``CREATE OR REPLACE TABLE ... SHALLOW CLONE`` copies table
        metadata, not data files — the right clone at 100 TB. This
        sandbox has no delta runtime, so execution is cluster-only; the
        emitted statement is pinned by a golden test and plain-parquet
        clones fall back to CTAS in ``Runner.clone``."""
        from sparkt.sqlcheck import check_shallow_clone

        self.execute(check_shallow_clone(
            f"CREATE OR REPLACE TABLE {target.render()} "
            f"SHALLOW CLONE {source_name}"
        ))
        # kind='clone', not 'table' (r12 adapter review #7): a clone
        # has no parquet LOCATION of its own, and the 'table' restore
        # branch KeyError'd on entry['location'] — the fixpoint loop
        # then silently dropped the clone (and its grants) from the
        # catalog on every restart
        self._record(target, kind="clone", cloned_from=source_name)

    @staticmethod
    def merge_into_sql(
        target: Relation,
        source_sql: str,
        unique_key: list[str],
        columns: list[str],
        predicates: list[str] | None = None,
        update_columns: list[str] | None = None,
        exclude_columns: list[str] | None = None,
    ) -> str:
        """The ACID-table-format merge statement: ``MERGE INTO`` as
        Delta Lake / Apache Iceberg execute it, mirroring the public
        dbt-spark ``spark__get_merge_sql`` macro surface —
        ``DBT_INTERNAL_DEST``/``DBT_INTERNAL_SOURCE`` aliases, ON over
        the unique key plus optional ``incremental_predicates``,
        ``UPDATE SET *`` (or the ``merge_update_columns`` /
        ``merge_exclude_columns`` explicit list), ``INSERT *``.

        Dispatched by the incremental 'merge' strategy when
        ``file_format`` is delta/iceberg (this sandbox has neither
        runtime, so the statement is emitted but a real cluster is
        where it executes; the versioned-path rewrite in
        ``materialize_incremental`` is the plain-parquet substitute —
        see adapter.py:7-17). At 100 TB MERGE is the right path: the
        table format prunes by file stats and rewrites only matched
        files instead of the whole relation.
        """
        on = " AND ".join(
            f"DBT_INTERNAL_DEST.`{k}` = DBT_INTERNAL_SOURCE.`{k}`"
            for k in unique_key
        )
        for p in predicates or []:
            on = f"({on}) AND ({p})"
        if update_columns:
            upd_cols = list(update_columns)
        elif exclude_columns:
            upd_cols = [c for c in columns if c not in set(exclude_columns)]
        else:
            upd_cols = None
        update_set = (
            "*"
            if upd_cols is None
            else ", ".join(
                f"DBT_INTERNAL_DEST.`{c}` = DBT_INTERNAL_SOURCE.`{c}`"
                for c in upd_cols
            )
        )
        from sparkt.sqlcheck import check_merge_into

        # grammar-validated at emit time (sparkt/sqlcheck.py): the
        # statement cannot execute in this sandbox, so a malformed
        # emission must fail HERE, not on the user's cluster
        return check_merge_into(
            f"MERGE INTO {target.render()} AS DBT_INTERNAL_DEST\n"
            f"USING ({source_sql}) AS DBT_INTERNAL_SOURCE\n"
            f"ON {on}\n"
            f"WHEN MATCHED THEN UPDATE SET {update_set}\n"
            f"WHEN NOT MATCHED THEN INSERT *"
        )

    @staticmethod
    def snapshot_merge_sql(
        target: Relation, staging_sql: str, insert_cols: list[str]
    ) -> str:
        """SCD-2 snapshot merge for ACID table formats, mirroring the
        reference's ``default__snapshot_merge_sql`` (public
        dbt-adapters project; driver at ``core/dbt/task/snapshot.py``):
        the staging select tags each row with ``dbt_change_type`` ∈
        {insert, update, delete}; matched update/delete rows close the
        current version (``dbt_valid_to``), unmatched insert rows add
        the new version. Dispatched when ``file_format`` is
        delta/iceberg — only changed files rewrite, vs the whole-
        relation versioned-path rewrite used on plain parquet."""
        from sparkt.sqlcheck import check_merge_into

        cols = ", ".join(f"`{c}`" for c in insert_cols)
        vals = ", ".join(
            f"DBT_INTERNAL_SOURCE.`{c}`" for c in insert_cols
        )
        return check_merge_into(
            f"MERGE INTO {target.render()} AS DBT_INTERNAL_DEST\n"
            f"USING ({staging_sql}) AS DBT_INTERNAL_SOURCE\n"
            "ON DBT_INTERNAL_SOURCE.dbt_scd_id = "
            "DBT_INTERNAL_DEST.dbt_scd_id\n"
            "WHEN MATCHED AND DBT_INTERNAL_DEST.dbt_valid_to IS NULL\n"
            " AND DBT_INTERNAL_SOURCE.dbt_change_type IN "
            "('update', 'delete')\n"
            "  THEN UPDATE SET dbt_valid_to = "
            "DBT_INTERNAL_SOURCE.dbt_valid_to\n"
            "WHEN NOT MATCHED AND DBT_INTERNAL_SOURCE.dbt_change_type = "
            "'insert'\n"
            f"  THEN INSERT ({cols}) VALUES ({vals})"
        )

    def _location_stats(self, location: str) -> tuple[int, int]:
        n_files = total = 0
        for root, _dirs, files in os.walk(location):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    total += os.path.getsize(os.path.join(root, f))
        return n_files, total

    def table_stats(self, relation: Relation) -> dict | None:
        """Catalog statistics for ``docs generate`` (the reference's
        catalog carries adapter-provided stats — ``core/dbt/task/docs/
        generate.py`` folds whatever the adapter returns into
        ``CatalogTable.stats``; the Spark adapter convention is
        ``bytes`` + ``rows`` parsed from table metadata). Here the
        warehouse is parquet-on-disk: bytes come from the file listing
        and rows from the parquet footers (a metadata-only count — no
        data scan), so stats cost O(files), not O(rows).

        Returns ``{"bytes": int, "rows": int}`` or None for views /
        location-less relations."""
        entry = self._catalog.get(f"{relation.schema}.{relation.identifier}")
        if not entry or entry.get("kind") != "table":
            return None
        location = entry.get("location")
        if not location:
            return None
        n_files, n_bytes = self._location_stats(location)
        if not n_files:
            return None
        rows = self.spark.read.parquet(location).count()
        return {"bytes": n_bytes, "rows": int(rows)}

    def optimize_table(
        self,
        relation: Relation | str,
        target_file_mb: int = 128,
        cluster_by: list[str] | None = None,
    ) -> dict:
        """OPTIMIZE-style table maintenance: compact files toward
        ``target_file_mb`` and optionally sort-cluster rows on
        ``cluster_by`` — the Spark-first substitute for Delta
        ``OPTIMIZE``/``ZORDER BY`` (SURVEY.md §4 "OPTIMIZE/compaction
        for Delta"; the reference leaves maintenance to the warehouse,
        but this engine IS the warehouse).

        Shapes, chosen for 100 TB:
        - compaction only: ``coalesce(n)`` — NARROW, no shuffle; a
          small-file-riddled table rewrites at scan speed.
        - ``cluster_by``: ``repartitionByRange(n, cols)`` +
          ``sortWithinPartitions`` — one range shuffle; globally
          range-clustered files give parquet min/max skipping on the
          leading column(s), the practical benefit of Z-ordering for
          single-column predicates (true multi-dim interleaving is a Delta
          feature; divergence documented).
        - partitioned tables compact within partitions (shuffle on the
          partition columns keeps directory layout).
        Atomicity comes from the same versioned-path swap as
        ``create_table_as``. Returns before/after file stats.
        """
        import math

        if isinstance(relation, str):
            schema, _, ident = relation.replace("`", "").rpartition(".")
            if not schema:
                raise ValueError(
                    "optimize_table: pass 'schema.identifier' or a Relation"
                )
            relation = Relation(schema=schema, identifier=ident)
        key = f"{relation.schema}.{relation.identifier}"
        entry = self._catalog.get(key)
        if entry is None or entry.get("kind") != "table":
            raise ValueError(f"optimize_table: {key} is not a managed table")
        if entry.get("bucket_by"):
            raise ValueError(
                "optimize_table: bucketed tables already control file "
                "placement via their bucket spec; rebuild instead"
            )
        files_before, bytes_total = self._location_stats(entry["location"])
        n_files = max(1, math.ceil(bytes_total / (target_file_mb * 1024**2)))
        df = self.spark.table(relation.render())
        part_cols = (
            self.partition_columns(relation) if entry.get("partitioned") else []
        )
        if part_cols:
            df = df.repartition(n_files, *part_cols)
            if cluster_by:
                df = df.sortWithinPartitions(*cluster_by)
            self.create_table_as(relation, df=df, partition_by=part_cols)
        elif cluster_by:
            df = df.repartitionByRange(n_files, *cluster_by) \
                .sortWithinPartitions(*cluster_by)
            self.create_table_as(relation, df=df)
        else:
            self.create_table_as(relation, df=df.coalesce(n_files))
        files_after, _ = self._location_stats(self._catalog[key]["location"])
        return {
            "files_before": files_before,
            "files_after": files_after,
            "bytes": bytes_total,
            "cluster_by": list(cluster_by or []),
        }

    def insert_into(self, relation: Relation, select_sql: str) -> None:
        # through execute() (r12 adapter review #10): the long-running
        # writes get the query comment AND the E016/E017 SQLQuery
        # event pair like every other statement
        self.execute(f"INSERT INTO {relation.render()} {select_sql}")

    def insert_overwrite(
        self, relation: Relation, select_sql: str
    ) -> None:
        """Dynamic-partition overwrite. REQUIRES a partitioned target:
        on an unpartitioned table ``INSERT OVERWRITE`` replaces every
        row, so we refuse rather than silently lose data (the caller
        should use a table rewrite / full refresh for that intent)."""
        from sparkt.exceptions import ExecutionError

        if not self.partition_columns(relation):
            raise ExecutionError(
                f"insert_overwrite on {relation.render()}: target is not "
                "partitioned — a full-table overwrite would silently drop "
                "all existing rows. Set partition_by on the model, or use "
                "the 'merge'/'delete+insert' strategy or --full-refresh."
            )
        # partitionOverwriteMode=dynamic is pinned in __init__
        # (ensure_runtime_conf); under STATIC this statement would
        # replace the whole table.
        self.execute(
            f"INSERT OVERWRITE TABLE {relation.render()} {select_sql}"
        )

    def drop_relation(self, relation: Relation) -> None:
        with self._ddl_lock:
            kind = "VIEW" if relation.type == "view" else "TABLE"
            self.spark.sql(f"DROP {kind} IF EXISTS {relation.render()}")
            self._unrecord(relation)

    def rename_relation(self, from_rel: Relation, to_rel: Relation) -> None:
        with self._ddl_lock:
            self.spark.sql(
                f"ALTER TABLE {from_rel.render()} RENAME TO {to_rel.render()}"
            )
            self._fire_cache(
                "rename_relation",
                f"{from_rel.schema}.{from_rel.identifier}",
                f"{to_rel.schema}.{to_rel.identifier}",
            )
            listings = getattr(self, "_listing", {})
            src = listings.get(from_rel.schema)
            if src is not None:
                src.pop(from_rel.identifier, None)
            dst = listings.get(to_rel.schema)
            if dst is not None:
                dst[to_rel.identifier] = "table"

    def alter_table_add_columns(
        self, relation: Relation, columns: list[tuple[str, str]]
    ) -> None:
        cols = ", ".join(f"{self.quote(n)} {t}" for n, t in columns)
        with self._ddl_lock:
            self.spark.sql(f"ALTER TABLE {relation.render()} ADD COLUMNS ({cols})")

    # -------------------------------------------------------------- grants
    @staticmethod
    def standardize_grants_dict(grants: dict) -> dict[str, list[str]]:
        """``{privilege: grantee | [grantees]}`` → lists, lower-cased
        privileges (reference ``standardize_grants_dict``,
        ``core/dbt/adapters`` surface consumed by ``task/run.py``)."""
        out: dict[str, list[str]] = {}
        for priv, grantees in (grants or {}).items():
            if isinstance(grantees, str):
                grantees = [grantees]
            out[str(priv).lower()] = [str(g) for g in grantees or []]
        return out

    def apply_grants(self, relation: Relation, grants: dict) -> dict:
        """Record grants on the relation. DOCUMENTED DIVERGENCE: Spark's
        in-memory catalog has no ACLs, so no GRANT DDL exists to run —
        the standardized grants are persisted in the engine catalog (and
        would compile to ``GRANT <priv> ON TABLE ... TO <grantee>`` on a
        Hive/Unity deployment) instead of being silently dropped."""
        std = self.standardize_grants_dict(grants)
        with self._ddl_lock:
            key = f"{relation.schema}.{relation.identifier}"
            entry = self._catalog.get(key)
            if entry is not None:
                entry["grants"] = std
                self._save_catalog()
        return std

    def get_grants(self, relation: Relation) -> dict[str, list[str]]:
        entry = self._catalog.get(
            f"{relation.schema}.{relation.identifier}"
        )
        return dict((entry or {}).get("grants") or {})

    # ----------------------------------------------------- macros / jobs
    def execute_macro(self, macro_name: str, context: dict, **kwargs):
        """Invoke a rendered macro by name against a prepared runtime
        context (reference ``adapter.execute_macro``, consumed by
        run-operation and materialization internals; the manifest-bound
        context is built by the engine and passed in, since the adapter
        itself is manifest-agnostic)."""
        fn = context.get(macro_name)
        if fn is None:
            raise KeyError(f"execute_macro: no macro named '{macro_name}'")
        return fn(**kwargs)

    def submit_python_job(self, ctx, node):
        """Run a python model (reference ``adapter.submit_python_job``,
        ``core/dbt/context/providers.py:1441``). On warehouse adapters
        this ships code to a remote cluster; here the engine IS the
        Spark cluster, so it executes in-process."""
        from sparkt.materializations.python_model import run_python_model

        return run_python_model(ctx, node)

    # ------------------------------------------------------ catalog docs
    def get_filtered_catalog(
        self, relations: list[Relation]
    ) -> list[dict]:
        """Column-level catalog rows for the given relations only
        (``core/dbt/task/docs/generate.py:215-366``: catalog queried
        once, filtered to manifest relations)."""
        out = []
        for rel in relations:
            if not self.relation_exists(rel):
                continue
            out.append(
                {
                    "schema": rel.schema,
                    "name": rel.identifier,
                    "type": rel.type,
                    "columns": self.get_columns_in_relation(rel),
                }
            )
        return out

    # ----------------------------------------------------------- freshness
    def calculate_freshness(
        self, relation: Relation, loaded_at_field: str, filter_sql: str | None
    ) -> float | None:
        """Seconds since max(loaded_at_field); reference
        ``core/dbt/task/freshness.py:107-145``."""
        where = f" WHERE {filter_sql}" if filter_sql else ""
        row = self.spark.sql(
            f"SELECT unix_timestamp(current_timestamp()) - "
            f"unix_timestamp(max({loaded_at_field})) AS age "
            f"FROM {relation.render()}{where}"
        ).first()
        return None if row is None or row["age"] is None else float(row["age"])

    def calculate_freshness_from_metadata(
        self, relation: Relation
    ) -> float | None:
        """Seconds since the newest data file backing the relation was
        written — the zero-scan path
        (``core/dbt/task/freshness.py:107-145``,
        ``calculate_freshness_from_metadata``; warehouse table metadata
        there, file mtimes for external parquet here — the exact
        analogue of a Delta/Iceberg last-commit timestamp)."""
        newest = self.metadata_max_loaded_at(relation)
        if newest is None:
            return None
        return max(0.0, time.time() - newest)

    def metadata_max_loaded_at(self, relation: Relation) -> float | None:
        """Absolute last-modified epoch of the newest data file backing
        the relation — deterministic across calls (unlike age, which
        moves with the clock); feeds the sources.json ``max_loaded_at``
        that ``source_status:fresher`` compares across runs."""
        entry = self._catalog.get(f"{relation.schema}.{relation.identifier}")
        path = None
        if entry is not None:
            path = entry.get("path") or entry.get("location")
        if path is None or not os.path.exists(path):
            return None
        newest = 0.0
        if os.path.isdir(path):
            # any DATA file counts, whatever the source format — a
            # parquet-only filter reported csv/json directory sources
            # as having no freshness at all (r12 adapter review #9);
            # only hidden/metadata entries (_SUCCESS, .crc) are skipped
            for dirpath, _, files in os.walk(path):
                for fn in files:
                    if fn.startswith((".", "_")):
                        continue
                    newest = max(
                        newest,
                        os.path.getmtime(os.path.join(dirpath, fn)),
                    )
        else:
            newest = os.path.getmtime(path)
        return None if newest == 0.0 else newest

    def calculate_freshness_from_metadata_batch(
        self, relations: list[Relation]
    ) -> dict[str, float | None]:
        """One call for all metadata-path sources
        (``calculate_freshness_from_metadata_batch``,
        ``core/dbt/task/freshness.py:107-145``) — on a warehouse this
        saves N information_schema round-trips; here it is one pass over
        the engine catalog."""
        return {
            f"{r.schema}.{r.identifier}":
                self.calculate_freshness_from_metadata(r)
            for r in relations
        }
