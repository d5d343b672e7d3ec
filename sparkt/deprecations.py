"""Deprecations framework: named, once-only deprecation warnings
routed through the event system.

Mirrors ``core/dbt/deprecations.py``: each deprecation has a stable
name and a structured warning event (reference D-codes); ``warn(name)``
fires the event at most once per process (``active_deprecations``
singleton) and routes through ``EventManager.warn_or_error`` so
``--warn-error`` / ``--warn-error-options`` can promote or silence a
SPECIFIC deprecation class by its event name. Deprecations hit during
project/profile loading — before a Runner (and its EventManager)
exists — are buffered and flushed when the runner attaches the manager.
"""

from __future__ import annotations

from dataclasses import dataclass

from sparkt.events import Event

# ----------------------------------------------------------------- events


@dataclass
class ConfigSourcePathDeprecation(Event):
    CODE = "D003"
    LEVEL = "warn"
    deprecated_path: str = "source-paths"
    exp_path: str = "model-paths"

    def message(self) -> str:
        return (f"The `{self.deprecated_path}` config has been renamed "
                f"to `{self.exp_path}`. Please update your "
                "`dbt_project.yml` configuration to reflect this change.")


@dataclass
class ConfigDataPathDeprecation(ConfigSourcePathDeprecation):
    CODE = "D004"
    deprecated_path: str = "data-paths"
    exp_path: str = "seed-paths"


@dataclass
class TestsConfigDeprecation(Event):
    CODE = "D012"
    LEVEL = "warn"
    deprecated_path: str = "tests"
    exp_path: str = "data_tests"

    def message(self) -> str:
        return (f"The `{self.deprecated_path}` config has been renamed "
                f"to `{self.exp_path}`. Please update your "
                "`dbt_project.yml` configuration to reflect this change.")


@dataclass
class SpacesInResourceNameDeprecation(Event):
    CODE = "D014"
    LEVEL = "warn"
    unique_id: str = ""

    def message(self) -> str:
        return f"Found spaces in the name of `{self.unique_id}`"


@dataclass
class ResourceNamesWithSpacesDeprecation(Event):
    CODE = "D015"
    LEVEL = "warn"
    count_invalid_names: int = 1

    def message(self) -> str:
        return (
            "Spaces in resource names are deprecated "
            f"({self.count_invalid_names} resource(s) affected); rename "
            "with underscores"
        )


@dataclass
class PackageRedirectDeprecation(Event):
    CODE = "D001"
    LEVEL = "warn"
    old_name: str = ""
    new_name: str = ""

    def message(self) -> str:
        return (f"The `{self.old_name}` package is deprecated in favor "
                f"of `{self.new_name}`. Please update your "
                "`packages.yml` configuration to use `{}` instead."
                .format(self.new_name))


# ----------------------------------------------------------- registry

_REGISTRY: dict[str, type] = {
    "project-config-source-paths": ConfigSourcePathDeprecation,
    "project-config-data-paths": ConfigDataPathDeprecation,
    "project-test-config": TestsConfigDeprecation,
    "package-redirect": PackageRedirectDeprecation,
    "resource-names-with-spaces": ResourceNamesWithSpacesDeprecation,
}

#: names already shown this process (reference active_deprecations)
active_deprecations: set[str] = set()

#: events fired before an EventManager was attached
_buffered: list[Event] = []

_manager = None


def warn(name: str, **kwargs) -> None:
    """Fire deprecation ``name`` at most once per process."""
    if name not in _REGISTRY:
        raise RuntimeError(f"Error showing deprecation warning: {name}")
    if name in active_deprecations:
        return
    active_deprecations.add(name)
    event = _REGISTRY[name](**kwargs)
    if _manager is not None:
        _manager.warn_or_error(event)
    else:
        _buffered.append(event)


def fire_event(event: Event) -> None:
    """Route a non-once-only warning event through the attached manager
    (or the pre-manager buffer) — used for per-resource companions of a
    named deprecation, e.g. SpacesInResourceNameDeprecation (D014)."""
    if _manager is not None:
        _manager.warn_or_error(event)
    else:
        _buffered.append(event)


def set_event_manager(manager, flush: bool = False) -> None:
    """Attach the invocation's EventManager. Buffered parse-time
    deprecations are NOT flushed here by default: the runner attaches
    the manager in __init__, BEFORE --warn-error/--warn-error-options
    are applied, and an early flush would make parse-time deprecations
    permanently un-promotable/un-silenceable. Tasks call
    :func:`flush_buffered` once their options are live (or pass
    ``flush=True`` when no task-level options can follow)."""
    global _manager
    _manager = manager
    if flush:
        flush_buffered()


def flush_buffered() -> None:
    """Emit buffered parse-time deprecations through the attached
    manager's warn_or_error — call AFTER warn-error options are set so
    include/exclude/silence apply to them."""
    while _buffered and _manager is not None:
        _manager.warn_or_error(_buffered.pop(0))


def reset() -> None:
    """Testing hook: forget shown deprecations and the manager."""
    global _manager
    active_deprecations.clear()
    _buffered.clear()
    _manager = None
