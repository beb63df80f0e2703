#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sf_dir] [out_dir] [--no-spark]

Runs graft.Verify (unless --no-spark and out_dir already populated),
then executes each oracle_sql.json entry in DuckDB over the same
parquet tables and compares: row count, column names (sorted), and a
hash of all values with rows sorted canonically. NOT part of the
library — driver-side python/duckdb only.
"""
import sys, os, json, subprocess, hashlib, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
no_spark = "--no-spark" in sys.argv

if not no_spark:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=3000)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        sys.exit("sbt runMain graft.Verify failed")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def canon(df: pd.DataFrame) -> tuple:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                # no .0-trimming: the driver's canon keeps int vs float
                # distinct (BIGINT 3344 != HUGEINT->float 3344.0), so an
                # oracle that forgets a CAST must fail HERE too
                vals.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                vals.append(str(pd.Timestamp(v)))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                vals.append("[" + ",".join(f"{float(x):.5f}" for x in v) + "]")
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    rows.sort()
    h = hashlib.sha256("\x02".join(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


fails = []
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
# every declared query must have spark output — a query that threw
# inside Verify would otherwise vanish silently (rows-only ones too)
declared = set(oracle)
qman = os.path.join(out_dir, "queries.json")
if os.path.exists(qman):
    declared |= set(json.load(open(qman)))
for missing in sorted(declared - set(names)):
    fails.append(missing)
    print(f"FAIL {missing}: declared but no spark output")
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        print(f"ok   {name}: rows-only ({len(got)} rows)")
        if len(got) == 0:
            fails.append(name); print(f"FAIL {name}: 0 rows")
        continue
    try:
        # HUGEINT tripwire (exact-typed twin of EntryConsistencySpec's
        # textual lint): DuckDB widens uncast sum(BIGINT) to HUGEINT,
        # which fetchdf() hands back as float64 — a hash mismatch on
        # identical values. Reject the dtype itself so the class can't
        # reach the compare.
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchdf()
        huge = [c for c, t in zip(desc["column_name"], desc["column_type"])
                if "HUGEINT" in str(t)]
        if huge:
            fails.append(name)
            print(f"FAIL {name}: oracle columns {huge} are HUGEINT "
                  f"(uncast integer sum — add CAST(... AS BIGINT))")
            continue
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: duckdb error {e}"); continue
    (gn, gc, gh), (en, ec, eh) = canon(got), canon(exp)
    if (gn, gc, gh) == (en, ec, eh):
        print(f"ok   {name}: {gn} rows hash={gh}")
    else:
        fails.append(name)
        print(f"FAIL {name}: spark(rows={gn},cols={gc},h={gh}) vs "
              f"duck(rows={en},cols={ec},h={eh})")
        if gc == ec and gn == en:
            g = got.reindex(sorted(got.columns), axis=1).sort_values(gc).reset_index(drop=True)
            e = exp.reindex(sorted(exp.columns), axis=1).sort_values(ec).reset_index(drop=True)
            for c in gc:
                if not g[c].astype(str).equals(e[c].astype(str)):
                    diff = (g[c].astype(str) != e[c].astype(str))
                    i = diff.idxmax()
                    print(f"  first diff col={c} row={i}: "
                          f"spark={g[c][i]!r} duck={e[c][i]!r} ({diff.sum()} rows differ)")

print(f"\n{len(names) - len(fails)}/{len(names)} queries pass")
sys.exit(1 if fails else 0)
