"""Indexer key ⇔ path round-trips and validation (reference test
model: ``tests/test_store/test_indexer.py``)."""

from __future__ import annotations

import pytest

from oups_spark.store.indexer import sublevel, toplevel


@toplevel
class Simple:
    country: str
    city: str


@sublevel
class Inner:
    freq: str
    variant: int


@toplevel
class Nested:
    exchange: str
    symbol: str
    inner: Inner


def test_roundtrip_simple():
    k = Simple("germany", "berlin")
    assert k.to_path == "germany-berlin"
    assert Simple.from_path("germany-berlin") == k
    assert Simple.depth() == 1


def test_roundtrip_nested():
    k = Nested("xetra", "dai", Inner("1h", 2))
    assert k.to_path == "xetra-dai/1h-2"
    assert Nested.from_path("xetra-dai/1h-2") == k
    assert Nested.depth() == 2


def test_ordering_and_hash():
    a, b = Simple("a", "x"), Simple("b", "x")
    assert a < b
    assert len({a, b, Simple("a", "x")}) == 2


def test_forbidden_chars():
    with pytest.raises(ValueError):
        Simple("ger many", "berlin")
    with pytest.raises(ValueError):
        Simple("ger-many", "berlin")  # field separator inside value
    with pytest.raises(ValueError):
        Simple("ger/many", "berlin")


def test_bad_parse():
    with pytest.raises(ValueError):
        Simple.from_path("only_one_field")
    with pytest.raises(ValueError):
        Nested.from_path("xetra-dai")  # missing sublevel


def test_bad_types_rejected():
    with pytest.raises(TypeError):
        @toplevel
        class Bad:
            x: float

def test_int_fields_roundtrip():
    @toplevel
    class WithInt:
        name: str
        year: int

    k = WithInt("abc", 2024)
    assert k.to_path == "abc-2024"
    assert WithInt.from_path("abc-2024") == k
    assert WithInt.from_path("abc-2024").year == 2024
