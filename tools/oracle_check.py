# Local stand-in for the driver's correctness gate: run graft.Verify first
# (writes <out>/<query>/ parquet + <out>/oracle_sql.json), then this script
# replays each oracle in DuckDB over the same SF tables and compares rows,
# schema (column names sorted) and a value hash, like the driver does.
#
#   sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify"
#   python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify [query ...]
import sys, os, json, glob
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def row_hash(df: pd.DataFrame):
    # canonical textual form; floats via repr (bit-faithful for doubles)
    def cell(v):
        if v is None or v != v:
            return "\\N"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


fails = 0
for name in sorted(oracles):
    if only and name not in only:
        continue
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"{name}: MISSING spark output")
        fails += 1
        continue
    try:
        oracle = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails += 1
        continue
    part_files = sorted(glob.glob(spark_path + "/*.parquet"))
    if not part_files:
        # zero part files (e.g. AQE wrote only _SUCCESS): schema is unknowable;
        # report against the oracle instead of crashing the whole run
        ok = len(oracle) == 0
        print(f"{name}: {'ok' if ok else 'FAIL'} rows=0/{len(oracle)} (no part files)")
        if not ok:
            fails += 1
        continue
    spark = pd.concat(
        [pd.read_parquet(f) for f in part_files],
        ignore_index=True,
    )
    s, o = canon(spark), canon(oracle)
    ok_rows = len(s) == len(o)
    ok_schema = list(s.columns) == list(o.columns)
    ok_vals = ok_rows and ok_schema and row_hash(s) == row_hash(o)
    status = "ok" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    print(f"{name}: {status} rows={len(s)}/{len(o)} schema={ok_schema} vals={ok_vals}")
    if status == "FAIL":
        fails += 1
        if ok_schema and ok_rows:
            diff = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(row_hash(s), row_hash(o)))
                if a != b
            ][:5]
            for i, a, b in diff:
                print(f"  row {i}: spark={a} oracle={b}")
        else:
            print(f"  spark cols={list(s.columns)} oracle cols={list(o.columns)}")
sys.exit(1 if fails else 0)
