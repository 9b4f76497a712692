#!/usr/bin/env python3
"""Type-strictness sweep over the oracle catalog.

The driver's hash gate is TYPE-SENSITIVE: DuckDB promotes sum()/window-sum
over BIGINT to HUGEINT, which pandas materializes as float64/object, and
the driver's value hash then diverges from Spark's BIGINT even when every
value is numerically identical (g01 + x22 red in CORRECTNESS_r06 with
rows+schema green). check_oracle.py's stringified compare is blind to it.

This script DESCRIBEs every oracle SQL in DuckDB and diffs the column
types against DuckDB's view of the Spark verify-output parquet. Any
mismatch is a latent driver-red row.

Usage: python3 scripts/oracle_typecheck.py <sfDir> <verifyOutDir>
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = n_ok = 0
    for name in sorted(oracle):
        try:
            duck = dict(zip(*[
                con.sql(f"DESCRIBE ({oracle[name]})").df()[c]
                for c in ("column_name", "column_type")]))
        except Exception as e:
            print(f"ERR  {name}: oracle DESCRIBE failed: {str(e)[:160]}")
            n_bad += 1
            continue
        try:
            spark = dict(zip(*[
                con.sql(f"DESCRIBE (SELECT * FROM read_parquet("
                        f"'{out_dir}/{name}/*.parquet'))").df()[c]
                for c in ("column_name", "column_type")]))
        except Exception as e:
            print(f"ERR  {name}: spark output unreadable: {str(e)[:160]}")
            n_bad += 1
            continue
        bad = []
        for c in sorted(set(duck) | set(spark)):
            dt, st = duck.get(c), spark.get(c)
            if dt != st:
                bad.append(f"{c}: spark={st} duck={dt}")
        if bad:
            print(f"TYPE {name}: " + "; ".join(bad))
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} type-clean, {n_bad} flagged, {len(oracle)} total")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
