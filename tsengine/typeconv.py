"""Parameter type coercion suite — reference ``type_conversion``
(src/common/util.py:31-102) re-implemented for the engine (C12).

The reference converts API request params to Postgres column types and uses
an error-as-value contract: ``{'success': val}`` or ``{'error': tag}``.
That dict contract is preserved here VERBATIM (it is this utility's public
shape; engine-internal callers unwrap and raise :class:`tsengine.core.TsError`
via :func:`convert_or_raise`).

Type-by-type parity notes:
- VARCHAR / TEXT: any value stringifiable -> its string (util.py:23-28;
  py2 ``unicode`` becomes ``str``).
- JSON: strings must json-load (returned LOADED, util.py:41-52); non-strings
  must json-dump (returned AS-IS, util.py:53-60).
- INTEGER / FLOAT: plain constructor coercion; failures return the
  constructor type object itself as the error tag (util.py:14-20).
- UUID: regex match 8-4-4-4-12 lowercase hex (re.match — prefix match, as
  in util.py:66), value returned unchanged.
- BOOLEAN: the 1/0/'1'/'0'/True/'True'/'true' table (util.py:73-81); other
  values return ``{'error': bool}``.
- INET: any valid IPv4/IPv6 literal (the reference's IPy accepts both;
  stdlib ``ipaddress`` replaces it), value returned unchanged.
- TIME '%H:%M' -> datetime.time; DATE '%Y-%m-%d' -> datetime.date.
- DATETIME: reference falls through with ``pass`` (returns None) — kept.
- unknown -> {'error': 'unknown type'}.
"""

from __future__ import annotations

import ipaddress
import json
import re
from datetime import datetime

from tsengine.core import TsError

_UUID_RE = re.compile(
    "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
)
_TRUE = (1, "1", True, "True", "true")
_FALSE = (0, "0", False, "False", "false")


def generic_conversion(data, data_type):
    try:
        return {"success": data_type(data)}
    except Exception:
        return {"error": data_type}


def string_conversion(data):
    try:
        return {"success": str(data)}
    except Exception:
        return {"error": str}


def type_conversion(data, postgres_type):
    """Convert ``data`` to the column type named by ``postgres_type``."""
    str_type = str(postgres_type)

    if re.match("VARCHAR", str_type):
        return string_conversion(data)
    if str_type == "JSON":
        if isinstance(data, str):
            try:
                return {"success": json.loads(data)}
            except Exception:
                return {"error": "json"}
        try:
            json.dumps(data)
            return {"success": data}
        except Exception:
            return {"error": "json"}
    if str_type == "INTEGER":
        return generic_conversion(data, int)
    if str_type == "TEXT":
        return string_conversion(data)
    if str_type == "UUID":
        if _UUID_RE.match(str(data)):
            return {"success": data}
        return {"error": "uuid"}
    if str_type == "FLOAT":
        return generic_conversion(data, float)
    if str_type == "DATETIME":
        return None  # reference falls through with `pass` (util.py:74)
    if str_type == "BOOLEAN":
        # note: `data in [...]` does the reference's equality scan, so
        # 1.0/0.0 coerce too (1.0 == 1) — preserved
        if data in _TRUE:
            return {"success": True}
        if data in _FALSE:
            return {"success": False}
        return {"error": bool}
    if str_type == "INET":
        try:
            ipaddress.ip_address(data)
            return {"success": data}
        except Exception:
            return {"error": "inet"}
    if str_type == "TIME":
        try:
            return {"success": datetime.strptime(data, "%H:%M").time()}
        except Exception:
            return {"error": "time"}
    if str_type == "DATE":
        try:
            return {"success": datetime.strptime(data, "%Y-%m-%d").date()}
        except Exception:
            return {"error": "date"}
    return {"error": "unknown type"}


def convert_or_raise(data, postgres_type):
    """Engine-side unwrap: value on success, :class:`TsError` on error —
    the bridge from the reference's error-as-value dicts to this engine's
    typed-exception convention (SURVEY.md §7.4 divergence note)."""
    out = type_conversion(data, postgres_type)
    if out is None or "error" in out:
        raise TsError("parameters do not have required format")
    return out["success"]
