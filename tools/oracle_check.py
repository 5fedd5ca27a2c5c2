#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped
by `graft.Verify` into OUTDIR/<name>/ (parquet) with OUTDIR/oracle_sql.json,
run the oracle SQL in DuckDB over the same testdata tables and compare
(columns sorted by name, rows sorted, values compared exactly after
normalization). Usage: oracle_check.py SFDIR OUTDIR
"""
import json, math, sys
from collections import Counter
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and representation noise far below our rounding
        return repr(round(v + 0.0, 9))
    return repr(v)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sfdir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = Path(outdir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1; continue
        grows = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False))
        wrows = sorted(tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False))
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}"); n_fail += 1
            continue
        if grows != wrows:
            # multiset diff: rows unique to each side (zip-pairing after
            # independent sorts misaligns on insert/delete-style diffs)
            gc, wc = Counter(grows), Counter(wrows)
            only_spark = list((gc - wc).elements())[:3]
            only_oracle = list((wc - gc).elements())[:3]
            print(f"FAIL {name}: value mismatch; only-in-spark: {only_spark}; "
                  f"only-in-oracle: {only_oracle}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
