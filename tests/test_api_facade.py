"""The facade contract: every name in ``api.__all__`` resolves — the
lazy-import map, the __getattr__ allowlist and __all__ cannot drift
apart (a typo in any of the three raised only at first user access)."""

import pytest

from racket_linkeddata_spark import api


def test_every_exported_name_resolves():
    for name in api.__all__:
        assert getattr(api, name) is not None, name


def test_unknown_name_raises():
    with pytest.raises(AttributeError):
        api.no_such_operator


def test_getattr_allowlist_subset_of_all():
    """Every name reachable via __getattr__ must be advertised in
    __all__ (star-import completeness) AND resolvable by the lazy
    import map — the three lists cannot drift (review r06e)."""
    missing = set(api._SPARK_API) - set(api.__all__)
    assert not missing, missing
    lazy = api._lazy_spark()
    unresolvable = [n for n in api._SPARK_API if n not in lazy]
    assert not unresolvable, unresolvable
