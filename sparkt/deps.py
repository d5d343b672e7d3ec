"""Hub/registry package dependencies, resolved offline.

Mirrors the reference's registry pinning pipeline:

- ``core/dbt/deps/registry.py:30`` (``RegistryPinnedPackage`` /
  ``RegistryUnpinnedPackage.resolved`` — merge all version ranges for a
  package, then pick the highest installable version in the range);
- ``core/dbt/clients/registry.py`` (hub API: ``api/v1/<name>.json``
  with ``{"versions": {v: {"downloads": {"tarball": url}}}}``, base URL
  overridable via ``DBT_PACKAGE_HUB_URL``);
- ``dbt_common.semver`` semantics (``VersionSpecifier`` operators
  ``= == >= <= > <``, prerelease ordering per semver 2.0);
- ``core/dbt/task/deps.py:178`` (``package-lock.yml`` recording the
  resolved pins plus a ``sha1_hash`` of the packages config, reused on
  later runs while ``packages.yml`` is unchanged).

Network-free by design: the registry base (env ``DBT_PACKAGE_HUB_URL``)
must be a local directory or ``file://`` tree laid out like the hub API
(``<base>/api/v1/<org>/<name>.json`` + tarballs). http(s) bases raise a
clear error in this environment instead of attempting egress.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass

from sparkt.exceptions import ParsingError

LOCK_FILE = "package-lock.yml"

# minor/patch optional: dbt-common's semver Matchers accept partial
# versions ('>=1.0', and YAML floats like `version: 1.2` reach here as
# '1.2'); missing parts zero-fill
_VERSION_RE = re.compile(
    r"^(?P<major>\d+)(?:\.(?P<minor>\d+))?(?:\.(?P<patch>\d+))?"
    r"(?:-(?P<prerelease>[0-9A-Za-z.\-]+))?"
    r"(?:\+[0-9A-Za-z.\-]+)?$"
)
_SPEC_RE = re.compile(r"^(?P<op>==|=|>=|<=|>|<)?\s*(?P<ver>.+)$")


@dataclass(frozen=True)
class Version:
    major: int
    minor: int
    patch: int
    prerelease: str | None = None

    @classmethod
    def parse(cls, s: str) -> "Version":
        m = _VERSION_RE.match(s.strip())
        if not m:
            raise ParsingError(f"invalid semver version: {s!r}")
        return cls(
            int(m.group("major")), int(m.group("minor") or 0),
            int(m.group("patch") or 0), m.group("prerelease"),
        )

    def _key(self):
        # semver 2.0: a prerelease sorts BEFORE its release; numeric
        # identifiers compare numerically, alphanumeric lexically
        pre = self.prerelease
        if pre is None:
            pre_key = (1,)
        else:
            parts = tuple(
                (0, int(p)) if p.isdigit() else (1, p)
                for p in pre.split(".")
            )
            pre_key = (0, parts)
        return (self.major, self.minor, self.patch, pre_key)

    def __lt__(self, other: "Version") -> bool:
        return self._key() < other._key()

    def __str__(self) -> str:
        base = f"{self.major}.{self.minor}.{self.patch}"
        return f"{base}-{self.prerelease}" if self.prerelease else base


@dataclass(frozen=True)
class Spec:
    op: str  # '=', '>=', '<=', '>', '<'
    version: Version

    def matches(self, v: Version) -> bool:
        if self.op == "=":
            return v._key() == self.version._key()
        if self.op == ">=":
            return not v < self.version
        if self.op == "<=":
            return not self.version < v
        if self.op == ">":
            return self.version < v
        return v < self.version  # '<'


def parse_specs(raw) -> list[Spec]:
    """Version field from packages.yml: a string (possibly
    comma-separated), a list of strings, or a bare number."""
    if raw is None:
        return []
    items: list[str] = []
    for part in raw if isinstance(raw, list) else [raw]:
        items.extend(str(part).split(","))
    out = []
    for item in items:
        item = item.strip()
        if not item:
            continue
        m = _SPEC_RE.match(item)
        op = "=" if (m.group("op") or "=") == "==" else m.group("op") or "="
        ver_raw = m.group("ver").strip()
        v = Version.parse(ver_raw)
        vm = _VERSION_RE.match(ver_raw)
        partial = vm.group("patch") is None and vm.group("prerelease") is None
        if op == "=" and partial:
            # a bare partial version is a RANGE, not an exact pin:
            # '1.2' ⇒ >=1.2.0 <1.3.0, '2' ⇒ >=2.0.0 <3.0.0
            if vm.group("minor") is None:
                hi = Version(v.major + 1, 0, 0)
            else:
                hi = Version(v.major, v.minor + 1, 0)
            out.append(Spec(">=", v))
            out.append(Spec("<", hi))
        else:
            out.append(Spec(op, v))
    return out


def resolve_version(
    specs: list[Spec], available: list[str],
    install_prerelease: bool = False,
) -> str:
    """Highest installable version satisfying every spec (reference
    ``semver.resolve_to_specific_version`` over ``filter_installable``).
    Prereleases are installable when the package entry sets
    ``install-prerelease: true`` (reference ``RegistryPackage
    .install_prerelease``, ``core/dbt/deps/registry.py``) or when some
    spec names one."""
    want_pre = install_prerelease or any(
        s.version.prerelease for s in specs
    )
    candidates = []
    for raw in available:
        try:
            v = Version.parse(raw)
        except ParsingError:
            continue
        if v.prerelease and not want_pre:
            continue
        if all(s.matches(v) for s in specs):
            candidates.append((v, raw))
    if not candidates:
        spec_str = ", ".join(f"{s.op}{s.version}" for s in specs) or "any"
        raise ParsingError(
            f"no version matching [{spec_str}] in available "
            f"versions {sorted(available)}"
        )
    return max(candidates, key=lambda t: t[0]._key())[1]


class LocalRegistry:
    """Hub-API-shaped registry on the local filesystem
    (``core/dbt/clients/registry.py`` without the network)."""

    def __init__(self, base_url: str | None = None):
        base = base_url or os.environ.get("DBT_PACKAGE_HUB_URL", "")
        if base.startswith("file://"):
            base = base[len("file://"):]
        if not base:
            raise ParsingError(
                "hub packages need a registry: set DBT_PACKAGE_HUB_URL to a "
                "local directory laid out like the hub API "
                "(api/v1/<org>/<name>.json + tarballs)"
            )
        if base.startswith(("http://", "https://")):
            raise ParsingError(
                f"registry '{base}' needs network egress; point "
                "DBT_PACKAGE_HUB_URL at a local hub-API mirror instead"
            )
        if not os.path.isdir(base):
            raise ParsingError(f"registry directory not found: {base}")
        self.base = base

    def metadata(self, package: str) -> dict:
        path = os.path.join(self.base, "api", "v1", f"{package}.json")
        if not os.path.exists(path):
            raise ParsingError(
                f"package '{package}' not found in registry {self.base}"
            )
        with open(path) as f:
            return json.load(f)

    def versions(self, package: str) -> list[str]:
        return list(self.metadata(package).get("versions", {}))

    def tarball(self, package: str, version: str) -> str:
        meta = self.metadata(package)["versions"][version]
        url = meta["downloads"]["tarball"]
        if url.startswith("file://"):
            url = url[len("file://"):]
        if url.startswith(("http://", "https://")):
            raise ParsingError(
                f"tarball for {package}@{version} is remote ({url}); "
                "local registries must ship local tarball paths"
            )
        if not os.path.isabs(url):
            url = os.path.join(self.base, url)
        if not os.path.exists(url):
            raise ParsingError(f"tarball missing: {url}")
        return url


@dataclass
class Pin:
    package: str  # org/name
    version: str
    tarball: str


def resolve_registry_packages(
    entries: list[dict], registry: LocalRegistry
) -> list[Pin]:
    """Resolve hub entries (``{package:, version:}``) plus the hub deps
    of the resolved packages' own ``packages.yml`` (one flat pass with
    per-package range merging — ``RegistryUnpinnedPackage.incorporate``
    in the reference), to a deterministic pinned list."""
    import tarfile

    import yaml

    specs: dict[str, list[Spec]] = {}
    # install-prerelease is per-package and sticky once any entry sets
    # it (reference RegistryUnpinnedPackage.incorporate ORs the flag)
    want_pre: dict[str, bool] = {}
    queue = [
        (e["package"], parse_specs(e.get("version")),
         bool(e.get("install-prerelease") or e.get("install_prerelease")))
        for e in entries
    ]
    resolved: dict[str, Pin] = {}
    # fixpoint: re-resolve until no new packages/specs appear (nested
    # hub deps can tighten ranges of already-seen packages)
    while queue:
        name, new_specs, pre = queue.pop(0)
        merged = specs.setdefault(name, [])
        before = len(merged)
        for s in new_specs:
            if s not in merged:
                merged.append(s)
        pre_before = want_pre.get(name, False)
        want_pre[name] = pre_before or pre
        if (name in resolved and len(merged) == before
                and want_pre[name] == pre_before):
            continue
        version = resolve_version(
            merged, registry.versions(name),
            install_prerelease=want_pre[name],
        )
        pin = Pin(name, version, registry.tarball(name, version))
        resolved[name] = pin
        # nested hub deps: peek at the tarball's packages.yml
        with tarfile.open(pin.tarball) as tf:
            for member in tf.getmembers():
                base = os.path.basename(member.name)
                if base == "packages.yml" and member.name.count("/") <= 1:
                    spec = yaml.safe_load(tf.extractfile(member).read()) or {}
                    for sub in spec.get("packages", []) or []:
                        if sub and sub.get("package"):
                            queue.append((
                                sub["package"],
                                parse_specs(sub.get("version")),
                                bool(sub.get("install-prerelease")
                                     or sub.get("install_prerelease")),
                            ))
    return sorted(resolved.values(), key=lambda p: p.package)


def _config_hash(packages_yml_text: str) -> str:
    # reference: sha1 of the packages config (core/dbt/task/deps.py)
    return hashlib.sha1(packages_yml_text.encode()).hexdigest()


def read_lock(project_root: str, packages_yml_text: str) -> list[Pin] | None:
    """Valid lock (hash matches current packages.yml) → pinned list."""
    import yaml

    path = os.path.join(project_root, LOCK_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        lock = yaml.safe_load(f) or {}
    if lock.get("sha1_hash") != _config_hash(packages_yml_text):
        return None
    pins = []
    for e in lock.get("packages", []) or []:
        if e.get("package") and e.get("version"):
            pins.append(Pin(e["package"], str(e["version"]), tarball=""))
    return pins


def write_lock(project_root: str, pins: list[Pin], packages_yml_text: str) -> None:
    import yaml

    doc = {
        "packages": [
            {"package": p.package, "version": p.version} for p in pins
        ],
        "sha1_hash": _config_hash(packages_yml_text),
    }
    with open(os.path.join(project_root, LOCK_FILE), "w") as f:
        yaml.dump(doc, f, sort_keys=False)


def install_dir_name(package: str) -> str:
    # dbt installs hub packages under the package (project) name — the
    # org prefix is registry namespace only
    return package.rsplit("/", 1)[-1].replace("-", "_")
