"""Secret env-var contract (VERDICT r13 #3; reference
``core/dbt/context/base.py:311-312,574``, ``core/dbt/context/secret.py``,
``core/dbt/config/renderer.py:177-228``): DBT_ENV_SECRET_* vars are
usable only in profiles.yml / packages.yml rendering, are refused by
every other env_var(), and are redacted from logs, events, and CLI
error output."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkt import secrets  # noqa: E402
from sparkt.exceptions import ParsingError  # noqa: E402


@pytest.fixture()
def secret_env(monkeypatch):
    monkeypatch.setenv("DBT_ENV_SECRET_TOKEN", "hunter2-token")
    monkeypatch.setenv("PLAIN_VAR", "plain-value")
    return "hunter2-token"


def test_base_env_var_refuses_secrets(secret_env):
    """A model/macro env_var('DBT_ENV_SECRET_*') must raise BEFORE
    reading the environment — the value can never reach compiled SQL
    or the parse cache (reference SecretEnvVarLocationError)."""
    from sparkt.parsing.context import ENV_VARS_READ, base_context

    ctx = base_context({}, {})
    with pytest.raises(ParsingError, match="profiles.yml"):
        ctx["env_var"]("DBT_ENV_SECRET_TOKEN")
    assert "DBT_ENV_SECRET_TOKEN" not in ENV_VARS_READ
    # even an UNSET secret name is refused (prefix alone decides)
    with pytest.raises(ParsingError):
        ctx["env_var"]("DBT_ENV_SECRET_MISSING", "dflt")
    # non-secrets unaffected
    assert ctx["env_var"]("PLAIN_VAR") == "plain-value"


def test_secret_env_var_returns_placeholder(secret_env):
    """Inside the secret context the Jinja pass sees only the inert
    placeholder — no Jinja manipulation of the real value possible."""
    got = secrets.secret_env_var("DBT_ENV_SECRET_TOKEN")
    assert got == (
        "$$$DBT_SECRET_START$$$DBT_ENV_SECRET_TOKEN$$$DBT_SECRET_END$$$"
    )
    assert secrets.secret_env_var("PLAIN_VAR") == "plain-value"
    assert secrets.secret_env_var("NOPE", "fallback") == "fallback"
    with pytest.raises(ParsingError):
        secrets.secret_env_var("NOPE_UNSET")


def test_render_secret_value_substitutes_after_jinja(secret_env):
    rendered = secrets.render_secret_value(
        "https://{{ env_var('DBT_ENV_SECRET_TOKEN') }}@github.com/org/repo"
    )
    assert rendered == "https://hunter2-token@github.com/org/repo"
    # Jinja CANNOT slice the secret: upper() runs on the placeholder,
    # so substitution misses and the scrubbed form remains inert
    mangled = secrets.render_secret_value(
        "{{ env_var('DBT_ENV_SECRET_TOKEN')[3:9] }}"
    )
    assert "hunter2" not in mangled
    assert secrets.render_secret_value(17) == 17
    assert secrets.render_secret_value("no jinja") == "no jinja"


def test_scrub_secrets_masks_values_and_placeholders(secret_env):
    assert secrets.scrub_secrets("tok=hunter2-token done") == "tok=***** done"
    ph = secrets.SECRET_PLACEHOLDER.format("DBT_ENV_SECRET_TOKEN")
    assert secrets.scrub_secrets(f"x {ph} y") == "x ***** y"
    assert secrets.scrub_secrets("clean") == "clean"


def test_jinja_log_scrubs_secret(secret_env, capsys):
    from sparkt.parsing.context import base_context

    ctx = base_context({}, {})
    ctx["log"]("leaked: hunter2-token", True)
    assert "hunter2-token" not in capsys.readouterr().out


def test_event_log_scrubs_secret(secret_env, tmp_path):
    from sparkt.events import EventManager, MainReportVersion

    mgr = EventManager(str(tmp_path), "inv-1")
    mgr.fire(MainReportVersion(version="contains hunter2-token"))
    mgr.close()
    with open(os.path.join(str(tmp_path), "dbt.log")) as f:
        text = f.read()
    assert "hunter2-token" not in text
    assert "*****" in text
    json.loads(text.splitlines()[0])  # still valid JSONL


def test_profiles_yml_renders_secret_and_artifacts_stay_clean(
    secret_env, tmp_path, spark
):
    """End-to-end: a secret wired into profiles.yml the dbt-documented
    way works (schema renders), while compiled SQL + manifest from a
    model that uses a PLAIN env var never contain the secret."""
    from tests.conftest import write_files

    from sparkt.runner import Runner

    write_files(
        str(tmp_path),
        {
            "dbt_project.yml": "name: secretproj\nmodel-paths: [models]\n",
            "profiles.yml": (
                "secretproj:\n"
                "  target: dev\n"
                "  outputs:\n"
                "    dev:\n"
                "      schema: \"sch_{{ env_var('DBT_ENV_SECRET_TOKEN')"
                " | length }}\"\n"
                "      threads: 2\n"
            ),
            "models/m1.sql": (
                "select '{{ env_var(\"PLAIN_VAR\") }}' as v"
            ),
        },
    )
    r = Runner(str(tmp_path), spark=spark)
    # placeholder substitution happens AFTER jinja: `| length` counted
    # the placeholder string, not the secret — exactly the reference
    # SecretRenderer two-phase behavior. The key guarantees:
    assert r.project.schema.startswith("sch_")
    assert "hunter2-token" not in r.project.schema
    res = r.run()
    assert res.ok
    # nothing under target/ contains the secret value
    for dirpath, _dirs, files in os.walk(os.path.join(str(tmp_path), "target")):
        for fn in files:
            with open(os.path.join(dirpath, fn), errors="ignore") as f:
                assert "hunter2-token" not in f.read(), fn
    spark.sql(f"DROP DATABASE IF EXISTS {r.project.schema} CASCADE")


def test_packages_yml_renders_secret_in_git_url(secret_env, tmp_path):
    """A git package token renders through the secret context; the
    rendered URL reaches the fetch layer but never the lock file."""
    from sparkt.secrets import render_secret_tree

    spec = {
        "packages": [
            {
                "git": (
                    "https://{{ env_var('DBT_ENV_SECRET_TOKEN') }}"
                    "@github.com/org/repo.git"
                ),
                "revision": "1.0.0",
            }
        ]
    }
    rendered = render_secret_tree(spec)
    assert rendered["packages"][0]["git"] == (
        "https://hunter2-token@github.com/org/repo.git"
    )
    assert rendered["packages"][0]["revision"] == "1.0.0"


def test_cli_error_report_scrubs_secret(secret_env, capsys):
    from sparkt.secrets import scrub_secrets

    msg = scrub_secrets("ERROR: fetch https://hunter2-token@x failed")
    assert "hunter2-token" not in msg and "*****" in msg


def test_event_log_scrubs_secret_with_json_escaped_chars(monkeypatch, tmp_path):
    """ADVICE r14: a secret containing characters json.dumps escapes
    (quote, backslash, newline, non-ASCII) must still be redacted from
    the serialized JSONL event line — scrub the encoded form too."""
    from sparkt.events import EventManager, MainReportVersion

    tricky = 'pa"ss\\wo\nrd-é'
    monkeypatch.setenv("DBT_ENV_SECRET_TRICKY", tricky)
    mgr = EventManager(str(tmp_path), "inv-1")
    mgr.fire(MainReportVersion(version=f"creds: {tricky} end"))
    mgr.close()
    with open(os.path.join(str(tmp_path), "dbt.log")) as f:
        text = f.read()
    assert "ss\\\\wo" not in text and 'pa\\"ss' not in text
    assert "*****" in text
    json.loads(text.splitlines()[0])  # still valid JSONL


def test_render_secret_value_wraps_jinja_errors(secret_env):
    """ADVICE r14: undefined constructs ({{ var('x') }}) and malformed
    templates surface as ParsingError naming the file, not raw jinja2
    exceptions (which CLI callers would print as a traceback)."""
    with pytest.raises(ParsingError, match="profiles.yml"):
        secrets.render_secret_value("{{ var('x') }}", where="profiles.yml")
    with pytest.raises(ParsingError, match="packages.yml"):
        secrets.render_secret_value("{{ unclosed", where="packages.yml")


def test_substitute_placeholder_raises_when_env_vanishes(secret_env, monkeypatch):
    """ADVICE r14: a placeholder whose env var was unset between render
    and substitution must error, not silently become ''."""
    placeholder = secrets.SECRET_PLACEHOLDER.format("DBT_ENV_SECRET_TOKEN")
    monkeypatch.delenv("DBT_ENV_SECRET_TOKEN")
    with pytest.raises(ParsingError, match="DBT_ENV_SECRET_TOKEN"):
        secrets._substitute_placeholders(f"url://{placeholder}@host")
