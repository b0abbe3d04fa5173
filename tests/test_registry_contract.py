"""Registry-wide driver-contract guards.

The driver's correctness comparator canonicalizes results through pandas and
hashes cell values; a raw ``array``/``map``/``struct`` column crashes it
(CORRECTNESS_r02 ``array_functions``: ``TypeError: unhashable type: 'list'``).
These tests pin the contract: every registered query builds a valid lazy plan
and emits only scalar (hashable) top-level columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from streamroom_bigdata_spark import registry

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


def _all_queries():
    return sorted(registry.queries().items())


@pytest.fixture(scope="module")
def schemas(spark, sf_dir):
    out = {}
    for name, fn in _all_queries():
        out[name] = fn(spark, sf_dir).schema
    return out


def test_every_query_builds_a_plan(schemas):
    assert len(schemas) == len(registry.queries())


def test_no_registered_query_returns_non_scalar_columns(schemas):
    offenders = {
        name: [f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields
               if isinstance(f.dataType, NON_SCALAR)]
        for name, schema in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert offenders == {}, (
        "driver comparator cannot hash these columns; flatten them "
        f"(array_join / to_json): {offenders}"
    )


def test_every_oracle_name_is_registered():
    qs, oracles = registry.queries(), registry.oracle_sql()
    assert set(oracles) <= set(qs)


def test_driver_sampled_names_still_registered():
    """Rename/removal drift guard (r10 VERDICT item #7): every query name
    the driver ever sampled into a CORRECTNESS_r*.json must still exist in
    the registry — a rename silently shrinks the driver's sampled signal
    (it intersects queries() with its history) with no red anywhere else.
    Mirrors the close_round.py gate so the drift is caught at pytest time
    too, not only at round close."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    reg = set(registry.queries())
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            sampled = set(json.load(f))
        gone = sorted(sampled - reg)
        assert not gone, f"{os.path.basename(path)} sampled {gone}"
