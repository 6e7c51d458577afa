"""Catalog behavior tests (registration, SQL visibility, caching)."""

from __future__ import annotations

import pytest

from ddataframeoperation_spark.catalog import Catalog, load_fixture_tables


def test_register_and_sql_visibility(spark, sf_dir):
    cat = load_fixture_tables(spark, sf_dir, tables=["region", "nation"])
    assert cat.names() == ["nation", "region"]
    assert spark.sql("SELECT count(*) AS n FROM region").head()["n"] == 5


def test_missing_table_names_available(spark):
    cat = Catalog(spark)
    with pytest.raises(KeyError) as e:
        cat.get("nope")
    assert "available" in str(e.value)


def test_cache_roundtrip(spark, sf_dir):
    cat = load_fixture_tables(spark, sf_dir, tables=["region"])
    df = cat.cache("region")
    assert df.count() == 5
    assert df.storageLevel.useMemory
    cat.uncache("region")
    assert not cat.get("region").storageLevel.useMemory
