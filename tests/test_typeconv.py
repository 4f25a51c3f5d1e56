"""C12: full type_conversion suite parity (reference src/common/util.py:31-102)
plus the F2 get_column_range param-strip shim (analysis_utils.py:31-57)."""

import datetime

import pytest

from tsengine.core import TsError
from tsengine.typeconv import convert_or_raise, type_conversion


def test_boolean_table():
    for v in (1, "1", True, "True", "true", 1.0):
        assert type_conversion(v, "BOOLEAN") == {"success": True}
    for v in (0, "0", False, "False", "false", 0.0):
        assert type_conversion(v, "BOOLEAN") == {"success": False}
    assert type_conversion("yes", "BOOLEAN") == {"error": bool}
    assert type_conversion(2, "BOOLEAN") == {"error": bool}


def test_integer_float():
    assert type_conversion("42", "INTEGER") == {"success": 42}
    assert type_conversion("x", "INTEGER") == {"error": int}
    assert type_conversion("2.5", "FLOAT") == {"success": 2.5}
    assert type_conversion("x", "FLOAT") == {"error": float}


def test_varchar_text():
    assert type_conversion(12, "VARCHAR(80)") == {"success": "12"}
    assert type_conversion("a", "TEXT") == {"success": "a"}


def test_json_load_vs_dump():
    # strings are LOADED; non-strings checked dumpable and returned as-is
    assert type_conversion('{"a": 1}', "JSON") == {"success": {"a": 1}}
    assert type_conversion("{bad", "JSON") == {"error": "json"}
    assert type_conversion({"a": 1}, "JSON") == {"success": {"a": 1}}
    assert type_conversion({"a": object()}, "JSON") == {"error": "json"}


def test_uuid_regex():
    u = "123e4567-e89b-12d3-a456-426614174000"
    assert type_conversion(u, "UUID") == {"success": u}
    # re.match is a PREFIX match in the reference — trailing junk passes
    assert type_conversion(u + "zz", "UUID") == {"success": u + "zz"}
    assert type_conversion("nope", "UUID") == {"error": "uuid"}


def test_inet():
    assert type_conversion("192.168.0.1", "INET") == {"success": "192.168.0.1"}
    assert type_conversion("::1", "INET") == {"success": "::1"}
    assert type_conversion("999.1.1.1", "INET") == {"error": "inet"}


def test_time_date():
    assert type_conversion("09:30", "TIME") == {"success": datetime.time(9, 30)}
    assert type_conversion("9h30", "TIME") == {"error": "time"}
    assert type_conversion("2024-01-31", "DATE") == {
        "success": datetime.date(2024, 1, 31)
    }
    assert type_conversion("31/01/2024", "DATE") == {"error": "date"}


def test_datetime_passthrough_and_unknown():
    assert type_conversion("x", "DATETIME") is None  # util.py:74 `pass`
    assert type_conversion("x", "BYTEA") == {"error": "unknown type"}


def test_convert_or_raise():
    assert convert_or_raise("true", "BOOLEAN") is True
    with pytest.raises(TsError):
        convert_or_raise("maybe", "BOOLEAN")
    with pytest.raises(TsError):
        convert_or_raise("x", "DATETIME")


def test_get_column_range_shim():
    from tsengine import timeutil

    rng = timeutil.get_column_range(
        {"data.from": 100, "data.to": 200, "other": 1}, now=1000, int_type="open"
    )
    assert (rng.lo, rng.hi) == (101, 199)
    with pytest.raises(TsError):
        timeutil.get_column_range({"no_prefix": 1}, now=1000)
