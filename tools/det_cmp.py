# Determinism double-run compare: given two graft.Verify output dirs, assert
# each named query's parquet is VALUE-identical — every row, every column,
# row order included, floats compared at the BIT level (struct-packed).
# Container/metadata differences are ignored; data differences fail.
#
#   sbt "runMain graft.Verify <sf> /tmp/detA q1 q2 ..." (twice -> detA, detB)
#   python3 tools/det_cmp.py /tmp/detA /tmp/detB q1 q2 ...
import sys, os, glob, struct
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:] or sorted(
    d for d in os.listdir(a_dir) if os.path.isdir(os.path.join(a_dir, d)))

def load(root, name):
    files = sorted(glob.glob(os.path.join(root, name, "*.parquet")))
    assert files, f"no parquet under {root}/{name}"
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon_cell(v):
    if isinstance(v, float):
        return struct.pack(">d", v).hex()  # NaN/-0.0/ulp all distinct
    return repr(v)

bad = 0
for name in names:
    da, db = load(a_dir, name), load(b_dir, name)
    ok = list(da.columns) == list(db.columns) and len(da) == len(db)
    if ok:
        for col in da.columns:
            ca = [canon_cell(v) for v in da[col]]
            cb = [canon_cell(v) for v in db[col]]
            if ca != cb:
                ok = False
                break
    print(f"{name}: {'identical' if ok else 'DIFFERS'} rows={len(da)}/{len(db)}")
    bad += 0 if ok else 1
sys.exit(1 if bad else 0)
