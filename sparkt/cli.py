"""CLI: ``python -m sparkt <command>``.

Mirrors the reference's click command surface
(``core/dbt/cli/main.py``) for the commands this engine implements:
run, build, test, seed, snapshot, compile, show, run-operation,
source-freshness, ls.
"""

from __future__ import annotations

import json

import click

from sparkt.runner import Runner


def _common(fn):
    fn = click.option("--project-dir", default=".", help="project root")(fn)
    fn = click.option("--select", "-s", default=None)(fn)
    fn = click.option("--exclude", default=None)(fn)
    fn = click.option("--selector", default=None,
                      help="named selector from selectors.yml")(fn)
    fn = click.option("--threads", type=int, default=None)(fn)
    fn = click.option("--vars", "vars_", default=None, help="YAML dict of vars")(fn)
    return fn


def _mk_runner(project_dir, vars_):
    import yaml

    from sparkt.exceptions import SparktError

    cli_vars = yaml.safe_load(vars_) if vars_ else {}
    try:
        return Runner(project_dir, cli_vars=cli_vars)
    except SparktError as e:
        # parse/compile-time project errors get a one-line report, not a
        # Python traceback
        click.echo(f"ERROR: {e}", err=True)
        raise SystemExit(2) from None


def _report(results) -> None:
    for r in results.results:
        click.echo(f"{r.status.upper():8s} {r.unique_id} ({r.execution_time:.2f}s)")
        if r.status == "error":
            click.echo(f"  {r.message}")
    ok = sum(1 for r in results.results if r.status in ("success", "pass"))
    click.echo(
        f"Done. total={len(results.results)} ok={ok} "
        f"elapsed={results.elapsed:.1f}s"
    )
    if not results.ok:
        raise SystemExit(1)


@click.group()
def cli():
    """sparkt — PySpark-native SQL transformation engine."""


def _make_cmd(name: str, full_refresh_opt: bool = False):
    @_common
    def cmd(project_dir, select, exclude, selector, threads, vars_, **kw):
        runner = _mk_runner(project_dir, vars_)
        fn = getattr(runner, name)
        kwargs = dict(select=select, exclude=exclude, selector=selector,
                      threads=threads,
                      state=kw.get("state"), defer=kw.get("defer", False))
        if full_refresh_opt:
            kwargs["full_refresh"] = kw.get("full_refresh", False)
            kwargs["empty"] = kw.get("empty", False)
        _report(fn(**kwargs))

    cmd = click.option("--state", default=None,
                       help="path to a previous target/ for state: selectors")(cmd)
    cmd = click.option("--defer", "defer", is_flag=True, default=False)(cmd)
    if full_refresh_opt:
        cmd = click.option("--full-refresh", is_flag=True, default=False)(cmd)
        cmd = click.option("--empty/--no-empty", "empty", default=False,
                           help="build with zero-row ref/source inputs")(cmd)
    return cli.command(name)(cmd)


_make_cmd("run", full_refresh_opt=True)
_make_cmd("build", full_refresh_opt=True)
_make_cmd("test")
_make_cmd("seed")
_make_cmd("snapshot")


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
def compile(project_dir, select):  # noqa: A001
    runner = Runner(project_dir)
    runner.compile(select=select)
    click.echo("compiled → target/manifest.json")


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--inline", default=None)
@click.option("--select", "-s", default=None)
@click.option("--limit", type=int, default=5)
def show(project_dir, inline, select, limit):
    runner = Runner(project_dir)
    runner.show(inline=inline, select=select, limit=limit).show(truncate=False)


@cli.command("run-operation")
@click.argument("macro_name")
@click.option("--project-dir", default=".")
@click.option("--args", default=None, help="YAML dict of macro args")
def run_operation(macro_name, project_dir, args):
    import yaml

    runner = Runner(project_dir)
    out = runner.run_operation(macro_name, yaml.safe_load(args) if args else {})
    if out is not None:
        click.echo(str(out))


@cli.command("source-freshness")
@click.option("--project-dir", default=".")
def source_freshness(project_dir):
    runner = Runner(project_dir)
    for row in runner.source_freshness():
        click.echo(json.dumps(row))


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
@click.option("--state", default=None)
def retry(project_dir, select, state):
    runner = Runner(project_dir)
    _report(runner.retry(select=select, state=state))


@cli.command()
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
@click.option("--state", required=True)
def clone(project_dir, select, state):
    runner = Runner(project_dir)
    for rel in runner.clone(state=state, select=select):
        click.echo(f"cloned {rel}")


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
        click.echo(f"ERROR: {e}", err=True)
        raise SystemExit(2) from None
    for p in loader.packages:
        click.echo(f"Installed {p.name} ({p.project_root})")
    click.echo(f"Done. packages={len(loader.packages)}")


@cli.command("docs-generate")
@click.option("--project-dir", default=".")
def docs_generate(project_dir):
    runner = Runner(project_dir)
    cat = runner.docs_generate()
    click.echo(f"catalog: {len(cat['nodes'])} relations -> target/catalog.json")


@cli.command("ls")
@click.option("--project-dir", default=".")
@click.option("--select", "-s", default=None)
@click.option("--exclude", default=None)
def ls(project_dir, select, exclude):
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    runner = Runner(project_dir)
    graph = link_graph(runner.manifest)
    for uid in sorted(select_nodes(graph, runner.manifest, select, exclude)):
        click.echo(uid)


if __name__ == "__main__":
    cli()
