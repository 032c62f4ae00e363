#!/usr/bin/env python3
"""Dev-side approximation of the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name, normalizes values, and
reports match/mismatch per query.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            oc = con.execute(sql)
            orows, ocols = oc.fetchall(), [d[0] for d in oc.description]
            # driver's hash is type-sensitive: surface e.g. DuckDB
            # HUGEINT sums vs Spark BIGINT locally via arrow types
            otypes = {f.name: str(f.type) for f in
                      con.execute(sql).arrow().schema}
            gtypes = {f.name: str(f.type) for f in con.execute(
                f"SELECT * FROM read_parquet("
                f"'{out_dir}/{name}/*.parquet')").arrow().schema}
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        # the DRIVER's comparator sorts rows via pandas and throws
        # "unhashable type: numpy.ndarray" on any list-typed result
        # column (round 6: v_centroid_update) — this tool tuple-izes
        # lists, so it would wrongly pass; hard-fail instead so an
        # array-shaped gate can never look locally green again
        arr_cols = [c for c, t in sorted(gtypes.items())
                    if t.startswith(("list", "large_list", "fixed_size_list"))]
        if arr_cols:
            print(f"FAIL {name}: array-typed result column(s) "
                  f"{arr_cols} — the driver comparator cannot hash "
                  f"these; project scalars (explode or concat_ws)")
            n_bad += 1
            continue
        for cname, ot in sorted(otypes.items()):
            gt = gtypes.get(cname)
            if gt is not None and gt != ot:
                print(f"WARN {name}: column {cname} type spark={gt} "
                      f"oracle={ot} (driver hash may mismatch)")
        gc, g = canon(grows, gcols)
        oc_, o = canon(orows, ocols)
        if gc != oc_:
            print(f"FAIL {name}: schema {gc} vs oracle {oc_}")
            n_bad += 1
        elif g != o:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, o)) if a != b]
            print(f"FAIL {name}: {len(g)} vs {len(o)} rows, "
                  f"{len(diffs)} differing; first: "
                  f"{diffs[0] if diffs else (len(g), 'len-mismatch')}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
