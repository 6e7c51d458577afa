"""Property-based tests (hypothesis) for the schema metadata contract."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ddataframeoperation_spark.functions.schema import (
    _NAME_TO_TYPE,
    schema_from_metadata,
)

_names = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
        min_size=1,
        max_size=12,
    ).filter(lambda s: not s[0].isdigit()),
    min_size=1,
    max_size=8,
    unique=True,
)
_types = st.lists(st.sampled_from(sorted(_NAME_TO_TYPE)), min_size=0, max_size=8)


@settings(max_examples=200, deadline=None)
@given(names=_names, types=_types)
def test_schema_from_metadata_total(names, types):
    """Any (names, types) pair parses: every name becomes a field, missing
    types pad to string, every type maps into the canonical vocabulary."""
    st_ = schema_from_metadata(", ".join(names), ", ".join(types))
    assert [f.name for f in st_.fields] == names
    for f, tname in zip(st_.fields, types + ["string"] * len(names)):
        assert f.dataType == _NAME_TO_TYPE.get(tname, _NAME_TO_TYPE["string"])


@settings(max_examples=100, deadline=None)
@given(names=_names)
def test_schema_parse_idempotent(names):
    """Parsing the emitted (names, simpleString-types) of a parsed schema
    reproduces it — the manifest round-trip invariant for vocabulary types."""
    st1 = schema_from_metadata(", ".join(names), "double, bigint, string")
    names2 = ", ".join(f.name for f in st1.fields)
    types2 = ", ".join(f.dataType.simpleString() for f in st1.fields)
    assert schema_from_metadata(names2, types2) == st1
