"""Pure-pandas/numpy oracle: a Python-3 re-implementation of the reference's
operator semantics (SURVEY.md §5 strategy item 2), used to randomized-compare
the Spark engine against the reference behavior without Spark.

Operates on plain python structures: a series is a list of (epoch, value)
pairs sorted by epoch; a ts_list is a list of series (dict keyed by
series_id in our long format).

Each function mirrors one reference function; citations inline.
"""

from __future__ import annotations

import numpy as np

from tsengine.timeutil import time_interval_beginning


def distribute(ts, seconds=300, e_to=None, e_from=None, fill_value=None):
    """tf:255-302: reindex to multiples of `seconds`, pad then bfill."""
    if not ts:
        return []
    epochs = [e for e, _ in ts]
    e_from = epochs[0] if e_from is None else int(e_from)
    e_to = epochs[-1] if e_to is None else int(e_to)
    g0 = seconds * (e_from // seconds)
    if e_from % seconds != 0:
        g0 += seconds
    g1 = seconds * (e_to // seconds + 1)
    if e_to % seconds != 0:
        g1 += seconds
    grid = list(range(g0, g1, seconds))
    lookup = dict(ts)
    out = []
    if fill_value is not None:
        for g in grid:
            out.append((g, lookup.get(g, fill_value)))
        return out
    # pad: last observation <= g
    vals = []
    i = -1
    for g in grid:
        while i + 1 < len(ts) and ts[i + 1][0] <= g:
            i += 1
        vals.append(ts[i][1] if i >= 0 else None)
    # bfill leading Nones
    first = next((v for v in vals if v is not None), None)
    vals = [first if v is None else v for v in vals]
    return list(zip(grid, vals))


def increments(ts, monotony="increasing", max_value=None, reset_value=0.0):
    """tf:321-395: lag diff with reset handling; stamped at second epoch."""
    rv = float(reset_value)
    out = []
    for (e0, v0), (e1, v1) in zip(ts, ts[1:]):
        if v0 > v1 and monotony == "increasing":
            v = v1 - rv + ((max_value - v0) if max_value is not None else 0.0)
        elif v0 < v1 and monotony == "decreasing":
            v = v1 - rv + ((max_value - v0) if max_value is not None else 0.0)
        else:
            v = v1 - v0
        out.append((e1, v))
    return out


def split(ts, period="day", tz_name="Europe/Madrid"):
    """tf:992-1049: group by calendar-period beginning (shift quirk)."""
    groups: dict[int, list] = {}
    for e, v in ts:
        b = time_interval_beginning(period, tz_name, e)
        groups.setdefault(b, []).append((e, v))
    return [groups[k] for k in sorted(groups)]


def inner_sum(ts):
    """tf:452-469: np.sum stamped at last epoch."""
    return (ts[-1][0], float(np.sum([v for _, v in ts])))


def inner_mean(ts):
    return (ts[-1][0], float(np.mean([v for _, v in ts])))


def inner_min(ts):
    return (ts[-1][0], float(np.amin([v for _, v in ts])))


def inner_max(ts):
    return (ts[-1][0], float(np.amax([v for _, v in ts])))


def inner_std(ts):
    """POPULATION std (tf:554)."""
    return (ts[-1][0], float(np.std([v for _, v in ts])))


def last(ts, number=1):
    return ts[-number:] if len(ts) >= number else ts


def usage_split_sum(ts, period, seconds=3600, e_from=None, e_to=None):
    """The flagship rollup: inner_sum(split(increments(distribute(ts))))."""
    d = distribute(ts, seconds=seconds, e_from=e_from, e_to=e_to)
    inc = increments(d)
    return [inner_sum(g) for g in split(inc, period=period)]


def rollup_tiers(turns, tiers=((60, "1m"), (3600, "1h"), (86400, "1d"))):
    """Tier rollup oracle over transcript turns of one conversation.

    turns: sorted list of dicts with epoch:int, role:str, tool:str|None.
    Derived value plane: turn latency = epoch - previous epoch (first turn
    has no latency).  Returns {tier: {bucket_epoch: row_dict}} where each row
    carries cnt / cnt_lat / vmin / vmax / vsum / vmean / role_dist / tool_dist
    computed with the same numpy reductions the reference uses
    (np.sum/amin/amax, tf:469/490/512).
    """
    epochs = [t["epoch"] for t in turns]
    lats = [None] + [b - a for a, b in zip(epochs, epochs[1:])]
    out: dict[str, dict[int, dict]] = {}
    for width, name in tiers:
        buckets: dict[int, dict] = {}
        for t, lat in zip(turns, lats):
            b = width * (t["epoch"] // width)
            row = buckets.setdefault(
                b, {"cnt": 0, "lats": [], "role_dist": {}, "tool_dist": {}}
            )
            row["cnt"] += 1
            if lat is not None:
                row["lats"].append(lat)
            row["role_dist"][t["role"]] = row["role_dist"].get(t["role"], 0) + 1
            if t.get("tool") is not None:
                row["tool_dist"][t["tool"]] = row["tool_dist"].get(t["tool"], 0) + 1
        final = {}
        for b, row in buckets.items():
            lats_arr = row.pop("lats")
            n = len(lats_arr)
            final[b] = {
                "cnt": row["cnt"],
                "cnt_lat": n,
                "vmin": float(np.amin(lats_arr)) if n else None,
                "vmax": float(np.amax(lats_arr)) if n else None,
                "vsum": float(np.sum(lats_arr)) if n else None,
                "vmean": float(np.sum(lats_arr)) / n if n else None,
                "role_dist": row["role_dist"],
                "tool_dist": row["tool_dist"],
            }
        out[name] = final
    return out
