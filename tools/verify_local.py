#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values compared
exactly after str() normalization)."""
import json, subprocess, sys, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def run_verify():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)

LOOSE = "--loose" in sys.argv

def table_rows(con, sql):
    if LOOSE:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
        return sorted(cols), sorted(out)
    # strict mode: round-trip through pandas exactly like the driver's
    # gate — DuckDB HUGEINT becomes float64 here ("32.0" vs "32"), and
    # array-typed columns make sort_values throw; both are the real
    # failure modes of CORRECTNESS_r09 (q60, q75)
    df = con.execute(sql).df()
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    out = [tuple(str(v) for v in row)
           for row in df.itertuples(index=False, name=None)]
    return cols, out

def main():
    if "--no-run" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)
    # artifact-backed oracles replay /tmp/graft_artifacts parquet written
    # by the Verify run that produced OUT; a later run (another SF, a
    # Bench) overwrites them and the compare silently mismatches. The
    # VERIFY_STAMP ties artifacts to their Verify run — flag instead of
    # reporting a bogus VALUE_MISMATCH.
    stale_artifacts = False
    stamp_path = "/tmp/graft_artifacts/VERIFY_STAMP"
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            stamp = json.load(f)
        if os.path.abspath(stamp.get("out_dir", "")) != os.path.abspath(OUT):
            stale_artifacts = True
        # a Bench run executes the same lambdas and rewrites the
        # artifacts WITHOUT touching the stamp — compare the recorded
        # content fingerprint (file count + max mtime) against the
        # directory's current state
        fp = stamp.get("artifacts_fingerprint")
        if fp is not None and not stale_artifacts:
            files = [os.path.join(r, f)
                     for r, _, fs in os.walk("/tmp/graft_artifacts")
                     for f in fs if f != "VERIFY_STAMP"]
            now = f"{len(files)}:{max((os.stat(p).st_mtime_ns // 1_000_000 for p in files), default=0)}"
            if now != fp:
                stale_artifacts = True
    elif any("/tmp/graft_artifacts" in sql for sql in oracles.values()):
        stale_artifacts = True
    results = {}
    for name in sorted(os.listdir(OUT)):
        pdir = os.path.join(OUT, name)
        if not os.path.isdir(pdir):
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            err = os.path.join(pdir, "error.json")
            if os.path.exists(err):
                with open(err) as f:
                    results[name] = f"ERROR: {json.load(f).get('error', '?')[:200]}"
            else:
                results[name] = "NO_OUTPUT"
            continue
        got_cols, got = table_rows(con, f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})"
            continue
        if stale_artifacts and "/tmp/graft_artifacts" in oracles[name]:
            results[name] = ("ARTIFACT_STALE: /tmp/graft_artifacts was written by a "
                             "different run than these outputs — re-run without --no-run")
            continue
        try:
            exp_cols, exp = table_rows(con, oracles[name])
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        if got_cols != exp_cols:
            results[name] = f"SCHEMA_MISMATCH got={got_cols} exp={exp_cols}"
        elif got == exp:
            results[name] = f"OK({len(got)})"
        else:
            diff = [f"rows got={len(got)} exp={len(exp)}"]
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    diff.append(f"row{i}: got={g} exp={e}")
                    if len(diff) > 4: break
            results[name] = "VALUE_MISMATCH " + "; ".join(diff)
    bad = 0
    for name, res in sorted(results.items()):
        flag = " " if res.startswith(("OK", "ROWS_ONLY")) else "X"
        if flag == "X": bad += 1
        print(f"{flag} {name}: {res}")
    print(f"\n{len(results)} queries, {bad} failing")
    sys.exit(1 if bad else 0)

main()
