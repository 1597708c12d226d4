#!/usr/bin/env python3
"""Type-level oracle audit — the check tools/check.py cannot do.

The driver's hash gate is type-sensitive: equal VALUES with different
physical types (DuckDB widening sum(BIGINT) OVER to HUGEINT, say) still
hash-mismatch. check.py compares Python ints so it is blind to this; here
we DESCRIBE each oracle query in DuckDB and diff its column types against
the Spark-written parquet's types (read back through DuckDB so both sides
use one type vocabulary).

Usage: python3 tools/typecheck.py <sfDir> <verifyOutDir>

Flags: any column whose DuckDB oracle type differs from the Spark parquet
type, with HUGEINT / DOUBLE-vs-DECIMAL called out loudly.
"""
import json, sys
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            etypes = {r[0]: r[1] for r in
                      con.sql(f"DESCRIBE ({sql})").fetchall()}
            gtypes = {r[0]: r[1] for r in con.sql(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()}
        except Exception as e:
            print(f"ERR  {name}: {e}")
            bad += 1
            continue
        diffs = [(c, gtypes.get(c), et) for c, et in etypes.items()
                 if gtypes.get(c) != et]
        if diffs:
            bad += 1
            for c, gt, et in diffs:
                loud = " <-- WIDENING" if et and "HUGEINT" in et else ""
                print(f"TYPE {name}.{c}: spark={gt} oracle={et}{loud}")
        else:
            print(f"ok   {name}")
    print(f"\n{bad} queries with type divergence" if bad else "\nall types agree")
    sys.exit(1 if bad else 0)

main()
