#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sf_dir] [out_dir] [--no-spark]

Runs graft.Verify (unless --no-spark and out_dir already populated),
then executes each oracle_sql.json entry in DuckDB over the same
parquet tables and compares: row count, column names (sorted), and a
hash of all values with rows sorted canonically. NOT part of the
library — driver-side python/duckdb only.
"""
import sys, os, json, subprocess, hashlib, glob, threading, time
import duckdb
import pandas as pd

# Per-oracle wall-clock cap. One pathological oracle (r12: the markov
# chained-CTE unroll that DuckDB inlined into exponential re-evaluation)
# must FAIL alone, never hang the whole board. DuckDB connections
# support interrupt(): a watchdog thread fires it after the cap and the
# running execute() raises, which we report as a timeout FAIL.
# Default 120s: the slowest LEGITIMATE oracle at sf0.01 (the recursive
# graph_components CTE) measures ~63s solo; the r12 pathology class
# does not finish in 150s — 120 splits them with margin both ways.
ORACLE_TIMEOUT_S = int(os.environ.get("GRAFT_ORACLE_TIMEOUT_S", "120"))


def run_capped(con, sql, seconds=ORACLE_TIMEOUT_S):
    """Execute sql; raise TimeoutError if it exceeds `seconds`."""
    timed_out = threading.Event()

    def fire():
        timed_out.set()
        con.interrupt()

    watchdog = threading.Timer(seconds, fire)
    watchdog.start()
    t0 = time.monotonic()
    try:
        return con.execute(sql).fetchdf()
    except Exception:
        if timed_out.is_set():
            raise TimeoutError(
                f"oracle exceeded {seconds}s wall clock "
                f"({time.monotonic() - t0:.1f}s elapsed)")
        raise
    finally:
        watchdog.cancel()

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
        desc = run_capped(con, f"DESCRIBE {oracle[name]}")
        huge = [c for c, t in zip(desc["column_name"], desc["column_type"])
                if "HUGEINT" in str(t)]
        if huge:
            fails.append(name)
            print(f"FAIL {name}: oracle columns {huge} are HUGEINT "
                  f"(uncast integer sum — add CAST(... AS BIGINT))")
            continue
        exp = run_capped(con, oracle[name])
    except TimeoutError as e:
        fails.append(name); print(f"FAIL {name}: {e}"); continue
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
