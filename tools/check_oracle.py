#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
test tables, and compares schema (sorted column names), row count, and a hash
of all values with columns sorted by name (mirroring the documented driver
behavior). Rows are compared order-insensitively (sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        return v
    return sorted([tuple(norm(v) for v in r) for r in rows], key=lambda t: str(t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output"); n_fail += 1; continue
        got = pq.read_table(files[0])
        if name not in oracle:
            print(f"ROWS  {name}: rows={got.num_rows} (no oracle)"); continue
        try:
            exp = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            print(f"FAIL  {name}: columns {g_cols} != {e_cols}"); n_fail += 1; continue
        # informational: physical type drift (a stricter driver could compare these)
        for c in g_cols:
            gt, et = got.schema.field(c).type, exp.schema.field(c).type
            if str(gt) != str(et):
                print(f"TYPE  {name}.{c}: spark={gt} duck={et}")
        g_rows = canon(zip(*[got.column(c).to_pylist() for c in g_cols])) if got.num_rows else []
        e_rows = canon(zip(*[exp.column(c).to_pylist() for c in e_cols])) if exp.num_rows else []
        if len(g_rows) != len(e_rows):
            print(f"FAIL  {name}: rowcount {len(g_rows)} != {len(e_rows)}"); n_fail += 1; continue
        if g_rows != e_rows:
            bad = next(i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b)
            print(f"FAIL  {name}: first diff at sorted-row {bad}:\n  spark={g_rows[bad]}\n  duck ={e_rows[bad]}")
            n_fail += 1; continue
        print(f"PASS  {name} ({len(g_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
