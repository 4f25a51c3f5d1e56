"""Test helpers: golden-vector comparison for long-format series frames."""

from __future__ import annotations

import math


def rows(df, cols=("series_id", "epoch", "value")):
    """Collect to sorted python tuples for golden comparison."""
    out = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: tuple((x is None, x) for x in t))


def assert_series_equal(df, expected, cols=("series_id", "epoch", "value"), tol=1e-9):
    """expected: iterable of tuples matching ``cols``; floats compared with tol."""
    got = rows(df, cols)
    exp = sorted(
        [tuple(e) for e in expected], key=lambda t: tuple((x is None, x) for x in t)
    )
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}\ngot={got[:20]}\nexp={exp[:20]}"
    for g, e in zip(got, exp):
        for gv, ev in zip(g, e):
            if isinstance(ev, float) and gv is not None:
                assert not (ev is None) and math.isclose(gv, ev, rel_tol=tol, abs_tol=tol), f"{g} != {e}"
            else:
                assert gv == ev, f"{g} != {e}"
