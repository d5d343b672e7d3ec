"""CLI: ``python -m sparkt <command>``.

Mirrors the reference's click command surface
(``core/dbt/cli/main.py``) for the commands this engine implements:
run, build, test, seed, snapshot, compile, show, run-operation,
source-freshness, deps, retry, clone, docs-generate, list/ls, clean,
init, debug.
"""

from __future__ import annotations

import json
import os

import click

from sparkt.runner import Runner


def _common(fn):
    fn = click.option("--target", "-t", "target", default=None,
                      envvar="DBT_TARGET",
                      help="profiles.yml output to use")(fn)
    fn = click.option("--profiles-dir", default=None,
                      help="directory holding profiles.yml "
                           "(reference cli/params.py profiles_dir)")(fn)
    fn = click.option("--target-path", default=None,
                      help="artifact output dir, default target/")(fn)
    fn = click.option("--partial-parse/--no-partial-parse",
                      "partial_parse", default=None,
                      help="reuse target/partial_parse cache")(fn)
    fn = click.option("--quiet", "-q", "quiet", is_flag=True,
                      default=False, envvar="DBT_QUIET",
                      help="only errors and the summary line")(fn)
    fn = click.option("--project-dir", default=".", help="project root")(fn)
    fn = click.option("--select", "-s", default=None)(fn)
    fn = click.option("--exclude", default=None)(fn)
    fn = click.option("--selector", default=None,
                      help="named selector from selectors.yml")(fn)
    fn = click.option("--threads", type=int, default=None,
                      envvar="DBT_THREADS")(fn)
    fn = click.option("--vars", "vars_", default=None, help="YAML dict of vars")(fn)
    return fn


def _mk_runner(project_dir, vars_, partial_parse=None):
    import yaml

    from sparkt.exceptions import SparktError

    cli_vars = yaml.safe_load(vars_) if vars_ else {}
    # record/replay support bundle — same env contract as the reference
    # dbt-common record engine (DBT_RECORDER_MODE=record|replay +
    # DBT_RECORDER_FILE_PATH); see sparkt/record.py
    mode = os.environ.get("DBT_RECORDER_MODE", "").lower()
    # True = default bundle path; the Runner resolves it against the
    # project's REAL target dir (target-path config aware)
    rec_path = os.environ.get("DBT_RECORDER_FILE_PATH") or True
    record = rec_path if mode == "record" else None
    replay = rec_path if mode == "replay" else None
    try:
        return Runner(project_dir, cli_vars=cli_vars,
                      partial_parse=partial_parse,
                      record=record, replay=replay)
    except SparktError as e:
        # parse/compile-time project errors get a one-line report, not a
        # Python traceback
        from sparkt.secrets import scrub_secrets

        click.echo(scrub_secrets(f"ERROR: {e}"), err=True)
        raise SystemExit(2) from None


def _report(results, quiet: bool = False) -> None:
    # programmatic invocations (sparktRunner.invoke) read the task
    # result off the click context object (reference dbtRunnerResult)
    _ctx = click.get_current_context(silent=True)
    if _ctx is not None and isinstance(_ctx.obj, dict):
        _ctx.obj["result"] = results
    for r in results.results:
        if not quiet:
            click.echo(
                f"{r.status.upper():8s} {r.unique_id} "
                f"({r.execution_time:.2f}s)"
            )
        if r.status == "error":
            from sparkt.secrets import scrub_secrets

            click.echo(scrub_secrets(f"  {r.message}"))
    ok = sum(1 for r in results.results if r.status in ("success", "pass"))
    click.echo(
        f"Done. total={len(results.results)} ok={ok} "
        f"elapsed={results.elapsed:.1f}s"
    )
    if not results.ok:
        raise SystemExit(1)


def _with_target(fn):
    """--target/-t for commands outside the _make_cmd family (show,
    compile, list, run-operation, source-freshness, docs-generate,
    clone) — environment selection applies to every warehouse-touching
    command."""
    return click.option("--target", "-t", "target", default=None,
                        envvar="DBT_TARGET",
                        help="profiles.yml output to use")(fn)


def _runner_with_target(project_dir, target=None, **kw):
    """Construct a Runner with DBT_TARGET set for the duration of
    project loading only (saved/restored: no leak into later
    in-process invocations)."""
    prev = os.environ.get("DBT_TARGET")
    if target:
        os.environ["DBT_TARGET"] = target
    try:
        return Runner(project_dir, **kw)
    finally:
        if target:
            if prev is None:
                os.environ.pop("DBT_TARGET", None)
            else:
                os.environ["DBT_TARGET"] = prev


def _version():
    from sparkt import __version__

    return __version__


@click.group()
@click.version_option(version=_version(), prog_name="sparkt",
                      message="%(prog)s %(version)s")
def cli():
    """sparkt — PySpark-native SQL transformation engine."""


def _make_cmd(name: str, full_refresh_opt: bool = False):
    @_common
    def cmd(project_dir, select, exclude, selector, threads, vars_, **kw):
        # -m/--models is the historical alias for --select
        select = select or kw.get("models")
        # flag values ride the env tier the project loader reads
        # (reference flags precedence: flag > env > default); restored
        # on exit so in-process sparktRunner.invoke calls don't inherit
        # a previous invocation's paths
        _env_sets = {
            "DBT_TARGET": kw.get("target"),
            "DBT_PROFILES_DIR": kw.get("profiles_dir"),
            "DBT_TARGET_PATH": kw.get("target_path"),
        }
        _env_prev = {
            k: os.environ.get(k) for k, v in _env_sets.items() if v
        }
        for k, v in _env_sets.items():
            if v:
                os.environ[k] = v
        try:
            runner = _mk_runner(project_dir, vars_,
                                partial_parse=kw.get("partial_parse"))
        finally:
            for k, prev in _env_prev.items():
                if prev is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = prev
        fn = getattr(runner, name)
        kwargs = dict(select=select, exclude=exclude, selector=selector,
                      threads=threads,
                      state=kw.get("state"), defer=kw.get("defer", False),
                      favor_state=kw.get("favor_state", False),
                      fail_fast=kw.get("fail_fast", False),
                      warn_error=kw.get("warn_error", False),
                      warn_error_options=kw.get("warn_error_options"),
                      indirect_selection=kw.get("indirect_selection"),
                      resource_types=list(kw.get("resource_types") or [])
                      or None,
                      exclude_resource_types=list(
                          kw.get("exclude_resource_types") or []) or None,
                      defer_state=kw.get("defer_state"),
                      store_failures=kw.get("store_failures", False),
                      write_json=kw.get("write_json", True))
        if full_refresh_opt:
            kwargs["full_refresh"] = kw.get("full_refresh", False)
            kwargs["empty"] = kw.get("empty", False)
            kwargs["event_time_start"] = kw.get("event_time_start")
            kwargs["event_time_end"] = kw.get("event_time_end")
            kwargs["sample"] = kw.get("sample")
            kwargs["export_saved_queries"] = kw.get(
                "export_saved_queries", False
            )
        _report(fn(**kwargs), quiet=kw.get("quiet", False))

    cmd = click.option("--resource-type", "resource_types", multiple=True,
                       help="restrict to these resource types "
                            "(repeatable; reference cli/params.py)")(cmd)
    cmd = click.option("--exclude-resource-type", "exclude_resource_types",
                       multiple=True,
                       help="drop these resource types (repeatable)")(cmd)
    cmd = click.option("--models", "-m", "models", default=None,
                       help="alias for --select")(cmd)
    cmd = click.option("--store-failures", "store_failures", is_flag=True,
                       default=False, envvar="DBT_STORE_FAILURES",
                       help="store failing rows of every data test")(cmd)
    cmd = click.option("--write-json/--no-write-json", "write_json",
                       default=True,
                       help="emit run_results.json / manifest.json")(cmd)
    cmd = click.option("--state", default=None,
                       help="path to a previous target/ for state: selectors")(cmd)
    cmd = click.option("--defer-state", "defer_state", default=None,
                       help="artifact dir used for --defer resolution "
                            "(defaults to --state)")(cmd)
    cmd = click.option("--defer", "defer", is_flag=True, default=False)(cmd)
    cmd = click.option("--favor-state", "favor_state", is_flag=True,
                       default=False, envvar="DBT_FAVOR_STATE")(cmd)
    # flag > DBT_* env var > default (reference core/dbt/cli/flags.py
    # precedence; click envvar implements the env tier)
    cmd = click.option("--fail-fast", "-x", "fail_fast", is_flag=True,
                       default=False, envvar="DBT_FAIL_FAST")(cmd)
    cmd = click.option("--warn-error", "warn_error", is_flag=True,
                       default=False, envvar="DBT_WARN_ERROR")(cmd)
    cmd = click.option(
        "--indirect-selection", "indirect_selection",
        type=click.Choice(["eager", "cautious", "buildable", "empty"]),
        default=None, envvar="DBT_INDIRECT_SELECTION",
        help="how tests attached to selected nodes are included "
             "(reference core/dbt/cli/params.py:138)")(cmd)
    cmd = click.option(
        "--warn-error-options", "warn_error_options", default=None,
        envvar="DBT_WARN_ERROR_OPTIONS",
        help="YAML mapping with include/exclude/silence lists of event "
             "names to promote/demote/suppress, e.g. "
             "'{\"include\": \"all\", \"exclude\": [\"TestWarning\"]}' "
             "(reference core/dbt/cli/main.py:138)")(cmd)
    if full_refresh_opt:
        cmd = click.option("--full-refresh", is_flag=True, default=False)(cmd)
        cmd = click.option("--empty/--no-empty", "empty", default=False,
                           help="build with zero-row ref/source inputs")(cmd)
        cmd = click.option("--event-time-start", default=None,
                           help="microbatch backfill window start "
                                "(ISO timestamp)")(cmd)
        cmd = click.option("--event-time-end", default=None,
                           help="microbatch backfill window end")(cmd)
        cmd = click.option("--sample", default=None,
                           envvar="DBT_SAMPLE",
                           help="dev-run time slice, e.g. '3 days': "
                                "event_time refs/sources scan only the "
                                "trailing window")(cmd)
        cmd = click.option("--export-saved-queries",
                           "export_saved_queries", is_flag=True,
                           default=False,
                           help="run saved-query exports after a "
                                "successful build")(cmd)
    return cli.command(name)(cmd)


_make_cmd("run", full_refresh_opt=True)
_make_cmd("build", full_refresh_opt=True)
_make_cmd("test")
_make_cmd("seed")
_make_cmd("snapshot")


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
@click.option("--inline", default=None,
              help="compile this jinja-SQL string instead of project files")
@_with_target
def compile(project_dir, select, inline, target):  # noqa: A001
    runner = _runner_with_target(project_dir, target)
    if inline is not None:
        click.echo(runner.compile_inline(inline))
        return
    runner.compile(select=select)
    click.echo("compiled → target/manifest.json")


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--inline", default=None)
@click.option("--select", "-s", default=None)
@click.option("--limit", type=int, default=5)
@click.option("--output", type=click.Choice(["text", "json"]),
              default="text")
@_with_target
def show(project_dir, inline, select, limit, output, target):
    runner = _runner_with_target(project_dir, target)
    df = runner.show(inline=inline, select=select, limit=limit)
    if output == "json":
        # reference show --output json (core/dbt/task/show.py preview)
        for row in df.toJSON().collect():
            click.echo(row)
    else:
        df.show(truncate=False)


@cli.command("run-operation")
@click.argument("macro_name")
@click.option("--project-dir", default=".")
@click.option("--args", default=None, help="YAML dict of macro args")
@_with_target
def run_operation(macro_name, project_dir, args, target):
    import yaml

    runner = _runner_with_target(project_dir, target)
    out = runner.run_operation(macro_name, yaml.safe_load(args) if args else {})
    if out is not None:
        click.echo(str(out))


@cli.command("source-freshness")
@click.option("--select", "-s", default=None)
@click.option("--project-dir", default=".")
@_with_target
def source_freshness(project_dir, select, target):
    runner = _runner_with_target(project_dir, target)
    for row in runner.source_freshness(select=select):
        click.echo(json.dumps(row))


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
@click.option("--state", default=None)
@_with_target
def retry(project_dir, select, state, target):
    runner = _runner_with_target(project_dir, target)
    _report(runner.retry(select=select, state=state))


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
@click.option("--state", required=True)
@_with_target
def clone(project_dir, select, state, target):
    runner = _runner_with_target(project_dir, target)
    n = 0
    for rel in runner.clone(state=state, select=select):
        click.echo(f"cloned {rel}")
        n += 1
    click.echo(f"Done. cloned={n}")


@cli.command()
@click.option("--project-dir", default=".")
def deps(project_dir):
    """Install package dependencies and write package-lock.yml
    (reference ``core/dbt/task/deps.py``). No SparkSession needed."""
    from sparkt.exceptions import SparktError
    from sparkt.parsing.parser import ManifestLoader
    from sparkt.project import load_project

    try:
        loader = ManifestLoader(load_project(project_dir))
    except SparktError as e:
        from sparkt.secrets import scrub_secrets

        click.echo(scrub_secrets(f"ERROR: {e}"), err=True)
        raise SystemExit(2) from None
    for p in loader.packages:
        click.echo(f"Installed {p.name} ({p.project_root})")
    click.echo(f"Done. packages={len(loader.packages)}")


@cli.command("docs-generate")
@click.option("--project-dir", default=".")
@click.option("--static", "static", is_flag=True, default=False,
              help="also write a self-contained static_index.html "
                   "(reference docs generate --static)")
@click.option("--empty-catalog", "empty_catalog", is_flag=True, default=False,
              help="skip relation introspection (reference --empty-catalog)")
@_with_target
def docs_generate(project_dir, static, empty_catalog, target):
    runner = _runner_with_target(project_dir, target)
    cat = runner.docs_generate(empty_catalog=empty_catalog)
    click.echo(f"catalog: {len(cat['nodes'])} relations -> target/catalog.json")
    if static:
        from sparkt.docs import write_static_index

        path = write_static_index(runner.project.target_dir)
        click.echo(f"static docs: {path}")


# json output keys (reference core/dbt/task/list.py:42 ALLOWED_KEYS)
_LIST_KEYS = (
    "name", "resource_type", "package_name", "original_file_path",
    "unique_id", "alias", "config", "tags", "depends_on", "source_name",
)


def _list_lines(runner, select, exclude, output, resource_types,
                output_keys=None):
    """Newline-delimited list output (reference
    ``core/dbt/task/list.py:97-167``: selector/name/json/path
    generators over the selected nodes)."""
    import json as _json

    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    graph = link_graph(runner.manifest)
    selected = select_nodes(graph, runner.manifest, select, exclude)
    nodes = runner.manifest.all_nodes()
    for uid in sorted(selected):
        n = nodes.get(uid)
        if n is None:
            continue
        if resource_types and n.resource_type not in resource_types:
            continue
        if n.resource_type == "source":
            if output == "selector":
                yield f"source:{n.package_name}.{n.source_name}.{n.name}"
            elif output == "name":
                yield f"{n.source_name}.{n.name}"
            elif output == "path":
                yield n.original_file_path
            else:
                d = {
                    "name": n.name, "resource_type": "source",
                    "package_name": n.package_name,
                    "original_file_path": n.original_file_path,
                    "unique_id": n.unique_id,
                    "source_name": n.source_name, "tags": n.tags,
                    "config": n.config,
                }
                if output_keys:
                    d = {k: v for k, v in d.items() if k in output_keys}
                yield _json.dumps(d)
            continue
        if output == "selector":
            # reference generate_selectors (core/dbt/task/list.py:97):
            # exposure/metric/semantic_model/saved_query/unit_test get
            # a type-prefixed pkg.name selector; everything else is
            # the dot-joined fqn INCLUDING subdirectory segments
            # (found r14 review: the old pkg.name form dropped the
            # directory components, so `ls --output selector | xargs
            # sparkt run -s` re-selected the wrong subtree for any
            # model living in a subdirectory)
            if n.resource_type in (
                "exposure", "metric", "semantic_model",
                "saved_query", "unit_test",
            ):
                yield f"{n.resource_type}:{n.package_name}.{n.name}"
            else:
                from sparkt.graph.selector import _node_fqn

                yield ".".join(_node_fqn(n))
        elif output == "name":
            yield n.name
        elif output == "path":
            yield n.original_file_path
        else:
            d = {
                "name": n.name, "resource_type": n.resource_type,
                "package_name": n.package_name,
                "original_file_path": n.original_file_path,
                "unique_id": n.unique_id,
                "alias": n.alias, "config": n.config, "tags": n.tags,
                "depends_on": {"nodes": n.depends_on},
            }
            if output_keys:
                d = {k: v for k, v in d.items() if k in output_keys}
            yield _json.dumps(d)


def _list_cmd(name: str):
    @cli.command(name)
    @click.option("--project-dir", default=".")
    @click.option("--select", "-s", default=None)
    @click.option("--exclude", default=None)
    @click.option("--output", type=click.Choice(
        ["json", "name", "path", "selector", "unique_id"],
        case_sensitive=False), default="selector")
    @click.option("--resource-type", "resource_types", multiple=True)
    @click.option("--output-keys", "output_keys", default=None,
                  help="space-separated keys to keep in --output json "
                       "rows (reference cli/params.py output_keys)")
    @_with_target
    def _cmd(project_dir, select, exclude, output, resource_types,
             output_keys, target):
        """List project resources (reference core/dbt/task/list.py)."""
        runner = _runner_with_target(project_dir, target)
        lines = []
        if output == "unique_id":  # sparkt extension (round-3 ls shape)
            from sparkt.graph.linker import link_graph
            from sparkt.graph.selector import select_nodes

            graph = link_graph(runner.manifest)
            rts = set(resource_types)
            for uid in sorted(select_nodes(graph, runner.manifest,
                                           select, exclude)):
                # --resource-type applies here too (r12 cli review
                # #4: scripted uid output included every type)
                if rts and uid.split(".", 1)[0] not in rts:
                    continue
                lines.append(uid)
                click.echo(uid)
        else:
            keys = set(output_keys.split()) if output_keys else None
            for line in _list_lines(runner, select, exclude, output,
                                    set(resource_types), output_keys=keys):
                lines.append(line)
                click.echo(line)
        # programmatic parity (r14 review; reference cli/main.py:500 —
        # ListTask.run's node_results ride dbtRunnerResult.result):
        # sparktRunner().invoke(["ls", ...]) gets the listed lines
        _ctx = click.get_current_context(silent=True)
        if _ctx is not None and isinstance(_ctx.obj, dict):
            _ctx.obj["result"] = lines
    return _cmd


_list_cmd("ls")
_list_cmd("list")


@cli.command()
@click.option("--project-dir", default=".")
def parse(project_dir):
    """Parse the project and write target/manifest.json without
    touching the warehouse (reference `dbt parse`,
    core/dbt/cli/main.py parse command). No SparkSession needed."""
    import time as _time

    from sparkt.exceptions import SparktError
    from sparkt.parsing.parser import ManifestLoader
    from sparkt.project import load_project

    t0 = _time.time()
    try:
        proj = load_project(project_dir)
        manifest = ManifestLoader(proj).load()
    except SparktError as e:
        from sparkt.secrets import scrub_secrets

        click.echo(scrub_secrets(f"ERROR: {e}"), err=True)
        raise SystemExit(2) from None
    manifest.build_parent_child_maps()
    os.makedirs(proj.target_dir, exist_ok=True)
    manifest.write(os.path.join(proj.target_dir, "manifest.json"))
    click.echo(
        f"Parsed {len(manifest.nodes)} nodes, "
        f"{len(manifest.sources)} sources in {_time.time()-t0:.2f}s "
        f"-> target/manifest.json"
    )


@cli.command("docs-serve")
@click.option("--project-dir", default=".")
@click.option("--port", type=int, default=8080)
def docs_serve(project_dir, port):
    """Serve target/ docs artifacts over HTTP (reference
    core/dbt/task/docs/serve.py:28)."""
    from sparkt.docs import serve_docs
    from sparkt.project import load_project

    serve_docs(load_project(project_dir).target_dir, port)


@cli.command()
@click.option("--project-dir", default=".")
def clean(project_dir):
    """Delete clean-targets dirs (reference core/dbt/task/clean.py:
    refuses to delete any configured source path)."""
    import shutil

    from sparkt.project import load_project

    proj = load_project(project_dir)
    source_paths = {
        os.path.realpath(os.path.join(proj.project_root, p))
        for p in (proj.model_paths + proj.seed_paths + proj.snapshot_paths
                  + proj.test_paths + proj.macro_paths + proj.analysis_paths)
    }
    project_root = os.path.realpath(proj.project_root)
    for target in proj.clean_targets:
        path = os.path.realpath(os.path.join(proj.project_root, target))
        # reference clean task: clean_project_files_only — refuse any
        # target that resolves outside (or to) the project root, so
        # '..', absolute paths, and symlink escapes never rmtree the
        # project or its parents (core/dbt/task/clean.py)
        if not path.startswith(project_root + os.sep):
            click.echo(
                f"ERROR: refusing to clean path outside project: {target}",
                err=True)
            raise SystemExit(2)
        # ancestor check, not equality (r12 cli review #3): cleaning
        # 'src' with model-paths [src/models] would rmtree the models
        if any(
            sp == path or sp.startswith(path + os.sep)
            for sp in source_paths
        ):
            click.echo(f"ERROR: refusing to clean source path {target}",
                       err=True)
            raise SystemExit(2)
        click.echo(f"Checking {target}/*")
        shutil.rmtree(path, ignore_errors=True)
        click.echo(f"Cleaned {target}/*")
    click.echo("Finished cleaning all paths.")


_STARTER_MODEL_1 = """\
{{ config(materialized='table') }}

with source_data as (
    select 1 as id
    union all
    select null as id
)
select * from source_data
"""
_STARTER_MODEL_2 = "select * from {{ ref('my_first_model') }}\nwhere id = 1\n"
_STARTER_SCHEMA = """\
version: 2

models:
  - name: my_first_model
    description: "A starter model"
    columns:
      - name: id
        tests: [unique]
  - name: my_second_model
    columns:
      - name: id
        tests: [not_null]
"""


@cli.command()
@click.argument("project_name", required=False)
@click.option("--skip-profile-setup", is_flag=True, default=False)
def init(project_name, skip_profile_setup):
    """Create a starter project (reference core/dbt/task/init.py +
    its starter-project scaffold)."""
    if not project_name:
        click.echo("ERROR: provide a project name: sparkt init <name>",
                   err=True)
        raise SystemExit(2)
    if os.path.exists(project_name):
        click.echo(f"ERROR: directory '{project_name}' already exists",
                   err=True)
        raise SystemExit(2)
    os.makedirs(os.path.join(project_name, "models", "example"))
    for rel, content in {
        "dbt_project.yml": (
            f"name: {project_name}\nversion: '1.0.0'\n"
            f"profile: {project_name}\n"
            "model-paths: [models]\nseed-paths: [seeds]\n"
            "test-paths: [tests]\nmacro-paths: [macros]\n"
            "snapshot-paths: [snapshots]\n"
            "clean-targets: [target, dbt_packages]\n"
            "models:\n  " + project_name + ":\n    example:\n"
            "      +materialized: view\n"
        ),
        "models/example/my_first_model.sql": _STARTER_MODEL_1,
        "models/example/my_second_model.sql": _STARTER_MODEL_2,
        "models/example/schema.yml": _STARTER_SCHEMA,
        ".gitignore": "target/\ndbt_packages/\nlogs/\n",
    }.items():
        path = os.path.join(project_name, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(content)
    if not skip_profile_setup:
        with open(os.path.join(project_name, "profiles.yml"), "w") as f:
            f.write(
                f"{project_name}:\n"
                "  target: dev\n"
                "  outputs:\n"
                "    dev:\n"
                "      type: spark\n"
                "      schema: analytics\n"
                "      threads: 4\n"
            )
    click.echo(f"Your new sparkt project \"{project_name}\" was created!")


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--connection", is_flag=True, default=False,
              help="only test the Spark connection")
def debug(project_dir, connection):
    """Diagnose project/profile/connection setup (reference
    core/dbt/task/debug.py: per-check OK/ERROR lines, nonzero exit on
    any failure)."""
    import platform

    from sparkt import __version__

    failures = 0

    def check(label, fn):
        nonlocal failures
        try:
            detail = fn()
            click.echo(f"  {label}: [OK{f' {detail}' if detail else ''}]")
        except Exception as e:  # noqa: BLE001 — each check reports
            failures += 1
            click.echo(f"  {label}: [ERROR] {e}")

    click.echo(f"sparkt version: {__version__}")
    click.echo(f"python version: {platform.python_version()}")

    def project_check():
        path = os.path.join(project_dir, "dbt_project.yml")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no dbt_project.yml at {path}")
        from sparkt.project import load_project

        return f"(name={load_project(project_dir).name})"

    def deps_check():
        import pyspark

        return f"(pyspark {pyspark.__version__})"

    def parse_check():
        from sparkt.parsing.parser import ManifestLoader
        from sparkt.project import load_project

        m = ManifestLoader(load_project(project_dir)).load()
        return f"({len(m.nodes)} nodes)"

    def connection_check():
        from sparkt.session import get_spark

        spark = get_spark(app_name="sparkt-debug")
        assert spark.sql("select 1 as ok").first()["ok"] == 1
        return f"(master={spark.conf.get('spark.master')})"

    if not connection:
        check("dbt_project.yml file", project_check)
        check("dependencies", deps_check)
        check("project parses", parse_check)
    check("connection test", connection_check)
    if failures:
        click.echo(f"{failures} check(s) failed")
        raise SystemExit(1)
    click.echo("All checks passed!")


if __name__ == "__main__":
    cli()


# ------------------------------------------------- programmatic API
class sparktRunnerResult:  # noqa: N801 — reference casing (dbtRunnerResult)
    """Mirror of the reference ``dbtRunnerResult``
    (``core/dbt/cli/main.py``): ``success``, ``result`` (the task's
    RunResults when one was produced), ``exception``."""

    def __init__(self, success, result=None, exception=None):
        self.success = success
        self.result = result
        self.exception = exception


class sparktRunner:  # noqa: N801 — reference casing (dbtRunner)
    """Programmatic in-process invocation, the reference ``dbtRunner``
    analogue (``core/dbt/cli/main.py``; behavior pinned by
    ``tests/functional/dbt_runner``)::

        res = sparktRunner().invoke(["run", "--project-dir", "proj"])
        assert res.success and res.result.results

    Runs the SAME click command pipeline as ``python -m sparkt`` —
    flags, env tiers and defaults included — but in-process, returning
    the task result instead of printing-and-exiting.
    """

    def invoke(self, args: list[str]) -> sparktRunnerResult:
        obj: dict = {}
        try:
            cli.main(
                args=list(args), standalone_mode=False, obj=obj,
                prog_name="sparkt",
            )
        except SystemExit as e:
            return sparktRunnerResult(
                success=(e.code in (0, None)), result=obj.get("result"),
            )
        except click.ClickException as e:
            return sparktRunnerResult(False, obj.get("result"), e)
        except Exception as e:  # noqa: BLE001 — reference catches all
            return sparktRunnerResult(False, obj.get("result"), e)
        return sparktRunnerResult(True, obj.get("result"))
