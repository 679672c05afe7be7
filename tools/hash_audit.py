#!/usr/bin/env python3
"""Grader-path hash audit: the strictest local stand-in for the driver's
DuckDB compare. Where verify_local.py compares cell VALUES via fetchall()
(which hides type-level divergence — e.g. DuckDB HUGEINT rendering as
float64 through pandas, the q_embed_quantize rounds-1-3 red), this renders
BOTH sides through pandas, sorts columns by name, and hashes the repr of
every row — so any value, type, or formatting divergence fails.

Usage: python3 tools/hash_audit.py <sfDir> <outDir>   (after graft.Verify)
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

def canon_scalar(v):
    # numpy >= 2.0 includes the dtype in scalar reprs ('np.int32(3)' vs
    # 'np.int64(3)'), so raw repr() would flip benign width differences
    # (e.g. an int32 row_number vs a BIGINT oracle cast) from PASS to FAIL
    # depending on the installed numpy. Unwrap to the Python value first;
    # repr of int/float/str/bool/None/Timestamp is version-stable.
    item = getattr(v, "item", None)
    return item() if callable(item) else v

def canon_hash(df):
    df = df[sorted(df.columns)]
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(canon_scalar(v) for v in row)).encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); bad += 1; continue
        sdf = pq.read_table(files[0]).to_pandas()
        ddf = con.sql(oracle[name]).df()
        if canon_hash(sdf) != canon_hash(ddf):
            bad += 1
            print(f"FAIL {name}: pandas-path hash differs")
            s2, d2 = sdf[sorted(sdf.columns)], ddf[sorted(ddf.columns)]
            for i in range(min(len(s2), len(d2))):
                a = tuple(canon_scalar(v) for v in s2.iloc[i])
                b = tuple(canon_scalar(v) for v in d2.iloc[i])
                if repr(a) != repr(b):
                    print(f"  first diff row {i}:\n  spark={a}\n  duck ={b}"); break
        else:
            print(f"PASS {name}")
    print(f"\n{len(oracle) - bad} pass, {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
