"""Secret env-var contract (reference: ``core/dbt/context/base.py:311``
``core/dbt/context/secret.py``, ``core/dbt/config/renderer.py:177-220``,
``core/dbt/constants.py:3``).

``DBT_ENV_SECRET_``-prefixed environment variables are usable ONLY in
profiles.yml / packages.yml rendering. Everywhere else ``env_var()``
refuses them, so a secret can never reach compiled SQL, the manifest,
or the parse cache. Inside the two allowed contexts the Jinja pass
returns an inert PLACEHOLDER (no Jinja string manipulation of the real
value possible) which is substituted post-render; log/event sinks
scrub both the placeholder form and the raw values.
"""

from __future__ import annotations

import os
import re

SECRET_ENV_PREFIX = "DBT_ENV_SECRET_"
SECRET_PLACEHOLDER = "$$$DBT_SECRET_START$$${}$$$DBT_SECRET_END$$$"

_PLACEHOLDER_RE = re.compile(
    re.escape("$$$DBT_SECRET_START$$$")
    + f"({re.escape(SECRET_ENV_PREFIX)}[A-Za-z0-9_]*)"
    + re.escape("$$$DBT_SECRET_END$$$")
)


def env_secrets() -> list[str]:
    """Current values of every set secret env var (reference
    ``exceptions.py:342``) — the scrub list."""
    return [
        v
        for k, v in os.environ.items()
        if k.startswith(SECRET_ENV_PREFIX) and v.strip()
    ]


def scrub_secrets(msg: str) -> str:
    """Replace secret VALUES and un-substituted placeholders with
    ``*****`` (reference ``base.py:574`` / dbt_common scrub_secrets).
    Applied at every log/event sink. Sinks that serialize first (the
    JSONL event log) would miss a secret containing characters
    json.dumps escapes (``"``, ``\\``, newlines, non-ASCII → \\uXXXX),
    so the JSON-encoded form of each value is scrubbed too."""
    if not isinstance(msg, str):
        return msg
    import json

    for val in env_secrets():
        if val in msg:
            msg = msg.replace(val, "*****")
        encoded = json.dumps(val)[1:-1]  # escaped form, quotes stripped
        if encoded != val and encoded in msg:
            msg = msg.replace(encoded, "*****")
    if "DBT_SECRET_START" in msg:
        msg = _PLACEHOLDER_RE.sub("*****", msg)
    return msg


def secret_env_var(name: str, default=None) -> str:
    """``env_var()`` as exposed inside profiles.yml / packages.yml
    rendering (reference ``context/secret.py:16-53``): secrets render
    to the placeholder (substituted after Jinja, so templates cannot
    slice/leak the value); non-secrets behave normally. Never recorded
    in the parse cache."""
    from sparkt.exceptions import ParsingError

    if name in os.environ and name.startswith(SECRET_ENV_PREFIX):
        return SECRET_PLACEHOLDER.format(name)
    v = os.environ.get(name)
    if v is None:
        v = default
    if v is None:
        raise ParsingError(f"env_var '{name}' is not set")
    return v


def _substitute_placeholders(rendered: str) -> str:
    """Swap placeholders for the real env values (reference
    ``renderer.py:206-217``, SecretRenderer.render_value). A
    placeholder whose env var has vanished between render and
    substitution is an error — silently emitting '' would produce a
    credential-less URL and a confusing downstream auth failure."""
    from sparkt.exceptions import ParsingError

    def sub(m: re.Match) -> str:
        val = os.environ.get(m.group(1))
        if val is None:
            raise ParsingError(
                f"secret env var '{m.group(1)}' was unset before its "
                "placeholder could be substituted"
            )
        return val

    return _PLACEHOLDER_RE.sub(sub, rendered)


def render_secret_value(value, where: str = "profiles.yml/packages.yml"):
    """Render ONE scalar from profiles.yml / packages.yml: Jinja with
    the secret-capable env_var, then placeholder substitution.
    Non-strings and Jinja-free strings pass through untouched. Jinja
    errors surface as ParsingError naming the file and expression
    (matching the reference renderer's error surface) so CLI callers
    that catch SparktError print the one-line form, not a traceback."""
    if not isinstance(value, str) or "{{" not in value:
        return value
    import jinja2

    from sparkt.exceptions import ParsingError

    try:
        tmpl = jinja2.Environment().from_string(value)
        rendered = tmpl.render(env_var=secret_env_var)
    except ParsingError:
        raise
    except jinja2.TemplateError as exc:
        raise ParsingError(
            f"failed to render {where} expression {value!r}: {exc}"
        ) from exc
    return _substitute_placeholders(rendered)


def render_secret_tree(obj, where: str = "profiles.yml/packages.yml"):
    """Recursively render a YAML-loaded dict/list in the secret
    context (the reference's SecretRenderer walks the whole doc)."""
    if isinstance(obj, dict):
        return {k: render_secret_tree(v, where) for k, v in obj.items()}
    if isinstance(obj, list):
        return [render_secret_tree(v, where) for v in obj]
    return render_secret_value(obj, where)
