#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare each Verify
parquet dump against its DuckDB oracle SQL, strictly (EXCEPT ALL in both
directions on name-sorted columns). Usage:
  python3 scripts/check_oracle.py <sf_dir> <verify_out_dir> [query ...]
"""
import duckdb, glob, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            # TEMP TABLES, not views: the compare below reads each side
            # three times (row count + both EXCEPT ALL directions); as a
            # view the oracle SQL re-EXECUTED per read, tripling the
            # gate's dominant cost (measured ~3x on the heavy unrolled
            # oracles). Materializing once keeps results identical.
            con.execute(f"CREATE OR REPLACE TEMP TABLE spark_out AS "
                        f"SELECT * FROM "
                        f"read_parquet('{out_dir}/{name}/*.parquet')")
            cols = [r[0] for r in con.execute(
                "DESCRIBE spark_out").fetchall()]
            csel = ", ".join(f'"{c}"' for c in sorted(cols))
            con.execute(f"CREATE OR REPLACE TEMP TABLE duck_out AS ({sql})")
            dcols = [r[0] for r in con.execute(
                "DESCRIBE duck_out").fetchall()]
            if sorted(cols) != sorted(dcols):
                print(f"SCHEMA   {name}: spark={sorted(cols)} "
                      f"duck={sorted(dcols)}")
                n_fail += 1
                continue
            # Type parity: the driver's value hash is representation-
            # sensitive beyond plain int width (HUGEINT and decimal
            # width/scale mismatches flipped r4's gate despite equal
            # values under EXCEPT ALL). Allow int-width diffs only.
            INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
            stypes = dict((r[0], r[1]) for r in con.execute(
                "DESCRIBE spark_out").fetchall())
            dtypes = dict((r[0], r[1]) for r in con.execute(
                "DESCRIBE duck_out").fetchall())
            tdiff = [(c, stypes[c], dtypes[c]) for c in sorted(stypes)
                     if stypes[c] != dtypes[c]
                     and not (stypes[c] in INTS and dtypes[c] in INTS)]
            if tdiff:
                print(f"TYPES    {name}: " + "; ".join(
                    f"{c} spark={s} duck={d}" for c, s, d in tdiff))
                n_fail += 1
                continue
            n_s = con.execute("SELECT count(*) FROM spark_out").fetchone()[0]
            n_d = con.execute("SELECT count(*) FROM duck_out").fetchone()[0]
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT {csel} FROM spark_out "
                f"EXCEPT ALL SELECT {csel} FROM duck_out)").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT {csel} FROM duck_out "
                f"EXCEPT ALL SELECT {csel} FROM spark_out)").fetchone()[0]
            if n_s == n_d and d1 == 0 and d2 == 0:
                print(f"PASS     {name}: rows={n_s}")
                n_pass += 1
            else:
                print(f"FAIL     {name}: rows spark={n_s} duck={n_d} "
                      f"spark-only={d1} duck-only={d2}")
                ex = con.execute(
                    f"SELECT {csel} FROM spark_out EXCEPT ALL "
                    f"SELECT {csel} FROM duck_out LIMIT 3").fetchall()
                ex2 = con.execute(
                    f"SELECT {csel} FROM duck_out EXCEPT ALL "
                    f"SELECT {csel} FROM spark_out LIMIT 3").fetchall()
                for r in ex: print(f"  spark-only: {r}")
                for r in ex2: print(f"  duck-only:  {r}")
                n_fail += 1
        except Exception as e:
            print(f"ERROR    {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name in oracle or (only and name not in only):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet("
                            f"'{d}/*.parquet')").fetchone()[0]
            print(f"ROWSONLY {name}: rows={n}")
            n_skip += 1
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

main()
