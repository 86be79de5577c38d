#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares as multisets (columns sorted by name, rows
sorted, floats rounded to 6 significant-ish digits).

Each oracle gets a hard wall-clock budget (ORACLE_BUDGET_SEC, default
30 s): an over-budget oracle is interrupted and counted as a loud FAIL.
This exists because a pathological oracle (e.g. an unmaterialized CTE
chain that DuckDB 1.0.0 inlines exponentially) otherwise hangs the
driver's gate and silently zeroes the whole round's correctness
artifact — see round 9.
"""
import json
import math
import os
import sys
import threading
import time

import duckdb

BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "30"))


def run_with_budget(con, sql, budget=BUDGET_SEC):
    """Run sql; on over-budget, interrupt the connection and raise."""
    out = {}
    def work():
        try:
            rel = con.execute(sql)
            out["cols"] = [d[0] for d in rel.description]
            out["rows"] = rel.fetchall()
        except Exception as e:  # includes the interrupt exception
            out["err"] = e
    t = threading.Thread(target=work, daemon=True)
    start = time.monotonic()
    t.start()
    t.join(budget)
    if t.is_alive():
        con.interrupt()
        t.join(10)
        raise TimeoutError(f"oracle exceeded {budget:.0f}s budget")
    if "err" in out:
        raise out["err"]
    return out["cols"], out["rows"], time.monotonic() - start

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return round(v, 6 - int(math.floor(math.log10(abs(v)))) - 1) if abs(v) > 1e-12 else 0.0
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def fresh_connection(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = fresh_connection(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    print(f"duckdb {duckdb.__version__}, per-oracle budget {BUDGET_SEC:.0f}s")
    results = {}
    slowest = (0.0, "")
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got_rows = got_rel.fetchall()
        except Exception as e:
            results[name] = f"FAIL (no result: {e})"
            continue
        try:
            exp_cols, exp_rows, took = run_with_budget(con, sql)
            slowest = max(slowest, (took, name))
        except TimeoutError as e:
            # The interrupt was fired on the shared connection and the
            # worker may still be draining; reusing the connection can
            # cascade one timeout into spurious interrupt errors on the
            # NEXT oracle. Recreate the connection (and views) instead.
            results[name] = f"FAIL (oracle error: {e})"
            try:
                con.close()
            except Exception:
                pass
            con = fresh_connection(sf_dir)
            continue
        except Exception as e:
            results[name] = f"FAIL (oracle error: {e})"
            continue
        gc, gr = rows_canon(got_cols, got_rows)
        ec, er = rows_canon(exp_cols, exp_rows)
        if gc != ec:
            results[name] = f"FAIL (schema: got {gc} vs oracle {ec})"
        elif len(gr) != len(er):
            results[name] = f"FAIL (rows: got {len(gr)} vs oracle {len(er)})"
        elif gr != er:
            diff = next((i for i, (a, b) in enumerate(zip(gr, er)) if a != b), -1)
            results[name] = (f"FAIL (values differ at sorted row {diff}: "
                             f"got {gr[diff]} vs {er[diff]})")
        else:
            results[name] = "PASS"
    n_pass = sum(1 for v in results.values() if v == "PASS")
    for name, v in sorted(results.items()):
        print(f"{'✓' if v == 'PASS' else '✗'} {name}: {v}")
    print(f"\n{n_pass}/{len(results)} oracle queries pass"
          f" (slowest oracle: {slowest[1]} {slowest[0]:.2f}s)")
    # rows-only entries (no oracle): report row counts
    import glob, os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
                print(f"· {name}: rows-only, {n} rows")
            except Exception as e:
                print(f"✗ {name}: rows-only, unreadable: {e}")
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
