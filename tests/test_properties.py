"""Property-based tests (hypothesis) for pure-Python kernels: semver
resolution, version ordering, and SQL-literal escaping. The reference
has no property testing (SURVEY.md §5); these pin the invariants the
example-based tests can't sweep."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

versions = st.tuples(
    st.integers(0, 20), st.integers(0, 20), st.integers(0, 20)
).map(lambda t: f"{t[0]}.{t[1]}.{t[2]}")


@given(st.lists(versions, min_size=1, max_size=8), versions)
@settings(max_examples=200, deadline=None)
def test_resolve_version_is_max_satisfying(avail, lo):
    """resolve_version returns the MAXIMUM available version satisfying
    every spec — never a lower satisfying one, never an unsatisfying
    one (reference semver.resolve_to_specific_version semantics)."""
    from sparkt.deps import Version, parse_specs, resolve_version
    from sparkt.exceptions import ParsingError

    specs = parse_specs(f">={lo}")
    sat = [v for v in avail if not Version.parse(v) < Version.parse(lo)]
    try:
        got = resolve_version(specs, avail)
    except ParsingError:
        assert not sat
        return
    assert got in avail
    assert all(s.matches(Version.parse(got)) for s in specs)
    assert all(
        not Version.parse(got) < Version.parse(v) for v in sat
    )


@given(st.lists(versions, min_size=2, max_size=6))
@settings(max_examples=200, deadline=None)
def test_version_ordering_total_and_consistent(vs):
    """Version ordering is a total order consistent with tuple order
    for plain x.y.z versions."""
    from sparkt.deps import Version

    parsed = [Version.parse(v) for v in vs]
    by_semver = sorted(parsed)
    by_tuple = sorted(parsed, key=lambda v: (v.major, v.minor, v.patch))
    assert [str(v) for v in by_semver] == [str(v) for v in by_tuple]


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_prerelease_sorts_before_release(s):
    """Any prerelease of X.Y.Z sorts strictly before X.Y.Z (semver
    2.0)."""
    from sparkt.deps import Version

    pre = Version(1, 2, 3, prerelease="rc.1")
    rel = Version(1, 2, 3)
    assert pre < rel and not rel < pre


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_sql_str_escaping_never_breaks_out(s):
    """_sql_str output contains no lone quote that could terminate the
    literal: every single quote is doubled."""
    import re

    class _FakeConf:
        def get(self, k, d=None):
            return "false"

    class _FakeSpark:
        conf = _FakeConf()

    from sparkt.adapter import _sql_str

    out = _sql_str(_FakeSpark(), s)
    # strip doubled quotes; none may remain
    assert "'" not in out.replace("''", "")
    # backslashes all doubled under the default escape mode
    assert "\\" not in re.sub(r"\\\\", "", out)
