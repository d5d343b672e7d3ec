"""Plugin / external-nodes hook.

Mirrors the reference's experimental plugin system
(``core/dbt/plugins/manager.py:163`` PluginManager,
``core/dbt/plugins/manifest.py`` PluginNodes/ModelNodeArgs,
``core/dbt/parser/manifest.py:795`` inject_external_nodes): a plugin
contributes EXTERNAL model nodes — relations built by some other
project or tool (the `dbt-loom` cross-project pattern) — that local
models can ``ref()`` without this engine building them. External nodes:

- resolve to their declared schema/identifier VERBATIM (naming macros
  do not apply: the relation already exists elsewhere);
- are never executed by run/build (no materialization);
- participate in the DAG, selection, and manifest artifacts normally.

Discovery matches the reference: any importable module named
``sparkt_*`` exposing a ``plugins`` list of plugin classes
(``PLUGIN_MODULE_PREFIX`` + ``pkgutil.iter_modules``), plus an explicit
:func:`register_plugin` API for in-process registration (tests,
embedded use).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ModelNodeArgs:
    """The subset of reference ``ModelNodeArgs``
    (``core/dbt/contracts/graph/node_args.py:10``) this engine
    executes against."""

    name: str
    package_name: str
    identifier: str
    schema: str
    relation_name: str | None = None
    depends_on_nodes: list[str] = field(default_factory=list)
    enabled: bool = True

    @property
    def unique_id(self) -> str:
        return f"model.{self.package_name}.{self.name}"


@dataclass
class PluginNodes:
    models: dict[str, ModelNodeArgs] = field(default_factory=dict)

    def add_model(self, model_args: ModelNodeArgs) -> None:
        self.models[model_args.unique_id] = model_args

    def update(self, other: "PluginNodes") -> None:
        self.models.update(other.models)


class SparktPlugin:
    """Base class (reference ``dbtPlugin``). Subclasses override
    ``initialize`` and ``get_nodes``."""

    def __init__(self, project_name: str):
        self.project_name = project_name
        self.initialize()

    @property
    def name(self) -> str:
        return type(self).__name__

    def initialize(self) -> None:
        """Optional extra setup."""

    def get_nodes(self) -> PluginNodes:
        raise NotImplementedError(
            f"get_nodes hook not implemented for {self.name}"
        )


PLUGIN_MODULE_PREFIX = "sparkt_"

#: in-process registry (register_plugin / clear_plugins)
_REGISTERED: list[type] = []


def register_plugin(plugin_cls: type) -> type:
    """Register a plugin class directly (also usable as a decorator)."""
    if plugin_cls not in _REGISTERED:
        _REGISTERED.append(plugin_cls)
    return plugin_cls


def clear_plugins() -> None:
    _REGISTERED.clear()


class PluginManager:
    def __init__(self, plugins: list[SparktPlugin]):
        self.plugins = plugins

    @classmethod
    def from_discovery(cls, project_name: str) -> "PluginManager":
        import importlib
        import pkgutil

        classes = list(_REGISTERED)
        for _, mod_name, _ in pkgutil.iter_modules():
            if not mod_name.startswith(PLUGIN_MODULE_PREFIX):
                continue
            try:
                mod = importlib.import_module(mod_name)
            except Exception:  # noqa: BLE001 — broken module ≠ broken engine
                continue
            for obj in getattr(mod, "plugins", []) or []:
                if isinstance(obj, type) and issubclass(obj, SparktPlugin):
                    classes.append(obj)
        return cls([c(project_name) for c in classes])

    def get_nodes(self) -> PluginNodes:
        out = PluginNodes()
        for plugin in self.plugins:
            out.update(plugin.get_nodes())
        return out


def get_plugin_manager(project_name: str) -> PluginManager:
    return PluginManager.from_discovery(project_name)
