"""Local mirror of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf tier and
compares row count, column set, and values against the matching
``oracle_sql()`` via DuckDB (order-insensitive; float columns compared at
1e-9). Queries without an oracle report row counts only.

Usage::

    PYTHONPATH=. python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: approximate queries checked against an exact-SQL oracle within a
#: relative tolerance (these stay OUT of oracle_sql() — the driver's gate
#: hash-compares values exactly, which a sketch can never satisfy).
#: name -> (sql, join_cols, value_col, rel_tol). join_cols=[] means a
#: single-row scalar compare.
TOLERANCE_ORACLES: dict = {
    "approx_distinct_users": (
        "SELECT COUNT(DISTINCT user_id) AS approx_distinct_users FROM events",
        [],
        "approx_distinct_users",
        0.10,
    ),
    "distinct_users_by_type": (
        "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS approx_distinct"
        " FROM events GROUP BY event_type",
        ["event_type"],
        "approx_distinct",
        0.10,
    ),
    # one-pass sketch vs the exact rank-select definition (same SQL as the
    # exact tier's oracle); 2% VALUE tolerance covers the documented
    # ≤(depth+1)/(2k) rank-error budget on this distribution
    "price_quantiles_approx": (
        "WITH s AS (SELECT l_extendedprice AS v,"
        "  ROW_NUMBER() OVER (ORDER BY l_extendedprice) - 1 AS rn,"
        "  COUNT(*) OVER () AS c FROM lineitem)"
        " SELECT CAST(t.q AS DOUBLE) AS q, s.v"
        " FROM (VALUES (0.5), (0.9), (0.99)) t(q)"
        " JOIN s ON s.rn = CAST(FLOOR(t.q * (s.c - 1)) AS BIGINT)",
        ["q"],
        "v",
        0.02,
    ),
}


def check_tolerance(name: str, got: pd.DataFrame, con) -> list:
    """Tolerance compare: same group rows, every estimate within rel_tol
    of the exact COUNT(DISTINCT). Returns problem strings (empty = OK)."""
    sql, join_cols, vcol, tol = TOLERANCE_ORACLES[name]
    exp = con.sql(sql).df()
    problems = []
    if len(got) != len(exp):
        problems.append(f"ROWS {len(got)} vs {len(exp)}")
        return problems
    if join_cols:
        m = got.merge(exp, on=join_cols, how="outer", suffixes=("_got", "_exp"))
        if m[f"{vcol}_got"].isna().any() or m[f"{vcol}_exp"].isna().any():
            problems.append("GROUPS differ")
            return problems
        g = m[f"{vcol}_got"].astype(float).to_numpy()
        x = m[f"{vcol}_exp"].astype(float).to_numpy()
    else:
        g = got[vcol].astype(float).to_numpy()
        x = exp[vcol].astype(float).to_numpy()
    denom = np.maximum(np.abs(x), 1.0)  # exact 0 must estimate exactly 0
    bad = np.abs(g - x) / denom > tol
    if (x == 0).any() and (g[x == 0] != 0).any():
        bad |= x == 0
    if bad.any():
        problems.append(f"VAL {vcol} beyond ±{tol:.0%} in {int(bad.sum())} group(s)")
    return problems


def to_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def main(sf_dir: str) -> int:
    import os

    import ray

    # align the cdc oracles' changelog tier with the sf being checked
    # (the driver always checks sf0.01; this mirror also supports others)
    base = os.path.basename(os.path.normpath(sf_dir))
    os.environ.setdefault("GRAFT_ORACLE_SF", base)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    only = set(os.environ["GRAFT_ONLY"].split(",")) if os.environ.get("GRAFT_ONLY") else None
    fails = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"{name:24s} RAY ERROR: {e}")
            continue
        dur = time.perf_counter() - t0
        if name in TOLERANCE_ORACLES:
            problems = check_tolerance(name, got, con)
            tag = "OK~tol" if not problems else "MISMATCH " + "; ".join(problems)
            print(f"{name:24s} {tag}   ({len(got)} rows, {dur:.1f}s)")
            if problems:
                fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(got):8d} rows   ({dur:.1f}s)")
            continue
        exp = con.sql(oracles[name]).df()
        problems = []
        if len(got) != len(exp):
            problems.append(f"ROWS {len(got)} vs {len(exp)}")
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            problems.append(f"COLS {gc} vs {ec}")
        if not problems:
            g = got[gc].sort_values(gc).reset_index(drop=True)
            x = exp[gc].sort_values(gc).reset_index(drop=True)
            for c in gc:
                a, b = g[c], x[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    ok = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True)
                else:
                    ok = (
                        a.astype(object).where(pd.notna(a), None).equals(
                            b.astype(object).where(pd.notna(b), None)
                        )
                    )
                if not ok:
                    problems.append(f"VAL {c}")
        tag = "OK" if not problems else "MISMATCH " + "; ".join(problems)
        print(f"{name:24s} {tag}   ({len(got)} rows, {dur:.1f}s)")
        if problems:
            fails.append(name)

    print("\n" + ("ALL QUERIES MATCH" if not fails else f"FAILURES: {fails}"))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
