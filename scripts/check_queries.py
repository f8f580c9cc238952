#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and diff it against its oracle_sql() twin in DuckDB — row count,
column names, and EXACT value equality (stricter than the driver's hash:
bitwise float equality, since both sides round identically).

Usage: python scripts/check_queries.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_rows(names, rows):
    def c(v):
        if isinstance(v, float):
            return v  # exact — both sides must round identically
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(c(x) for x in v)
        return v

    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(c(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from parquery_spark.session import get_spark

    spark = get_spark("check_queries")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in df.collect()]
            cols = list(df.columns)
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_weak += 1
            continue
        try:
            rel = con.sql(oracles[name])
            duck_arrow = rel.arrow()
            duck_cols = list(duck_arrow.column_names)
            duck_rows = rel.fetchall() if False else [
                tuple(r) for r in zip(*[c.to_pylist() for c in duck_arrow.columns])
            ] if duck_arrow.num_columns else []
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(cols) != sorted(duck_cols):
            problems.append(f"columns {sorted(cols)} != {sorted(duck_cols)}")
        else:
            try:
                spark_arrow = df.limit(0).toArrow()
                for c in cols:
                    st = spark_arrow.schema.field(c).type
                    dt = duck_arrow.schema.field(c).type
                    if str(st) != str(dt):
                        problems.append(f"type[{c}]: spark {st} != oracle {dt}")
            except Exception as e:
                problems.append(f"schema introspection failed: {e}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} != {len(duck_rows)}")
        if not problems:
            a, b = canon_rows(cols, spark_rows), canon_rows(duck_cols, duck_rows)
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            if bad:
                problems.append(f"{len(bad)} mismatched rows; first: {bad[0]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
