#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the parquet dumped by
graft.Verify (columns sorted by name, rows sorted, exact values)."""
import json, sys, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    try:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    except Exception:
        pass  # partial corpora (e.g. docs-only decade dirs) skip absent tables

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: no spark output: {e}"); fail += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    x = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(x.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}"); fail += 1; continue
    # The driver's hash is dtype-sensitive ACROSS KINDS but not widths:
    # int32 vs int64 hashes equal (r08 evidence: q19/q27/... all green),
    # while a DuckDB HUGEINT (sum(BIGINT) promotes to int128 → pandas
    # float64) vs Spark BIGINT mismatches even when every value is equal
    # (the corpus_diff r08 red row). Both frames here come through
    # DuckDB's pandas conversion, so comparing dtype KINDS catches that
    # class before the driver does.
    gd, xd = [t.kind for t in g.dtypes], [t.kind for t in x.dtypes]
    if gd != xd:
        diffs = [(c, str(a), str(b)) for c, a, b in zip(g.columns, g.dtypes, x.dtypes)
                 if a.kind != b.kind]
        print(f"FAIL {name}: dtype kinds {diffs}"); fail += 1; continue
    if len(g) != len(x):
        print(f"FAIL {name}: rows {len(g)} vs {len(x)}"); fail += 1; continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    x = x.sort_values(by=list(x.columns)).reset_index(drop=True)
    bad = None
    for c in g.columns:
        for i in range(len(g)):
            a, b = g[c][i], x[c][i]
            if a is None and b is None: continue
            try:
                if isinstance(a, float) or isinstance(b, float):
                    fa, fb = float(a), float(b)
                    if math.isnan(fa) and math.isnan(fb): continue
                    if fa != fb: bad = (c, i, a, b); break
                elif str(a) != str(b): bad = (c, i, a, b); break
            except Exception:
                if str(a) != str(b): bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
        fail += 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
print(f"\n{len(oracle)-fail}/{len(oracle)} passed")
sys.exit(1 if fail else 0)
