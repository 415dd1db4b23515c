#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate:
run graft.Verify (sbt) at a given SF, then execute each oracle SQL in DuckDB
over the same parquet tables and compare row counts, sorted columns, values.

Usage: python3 tools/verify_local.py [sfdir] [outdir] [--skip-spark] [query...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return str(v)


def table_key(rows, cols):
    # driver sorts columns by name before hashing values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])
    if "--skip-spark" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            capture_output=True, text=True, cwd="/root/repo")
        sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                                   if "[verify]" in l or "error" in l.lower()) + "\n")
        if r.returncode != 0:
            print("VERIFY RUN FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

    oracles = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        spark_dir = Path(outdir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        status = []
        if sorted(sp_cols) != sorted(du_cols):
            status.append(f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
        elif len(sp_rows) != len(du_rows):
            status.append(f"rows spark={len(sp_rows)} duck={len(du_rows)}")
        else:
            a, b = table_key(sp_rows, sp_cols), table_key(du_rows, du_cols)
            if a != b:
                diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                status.append(f"values differ, first diffs: {diffs}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(sp_rows)} rows)"); n_pass += 1
        results[name] = not status
    # queries without oracle: just report row counts
    for d in sorted(Path(outdir).iterdir()):
        if d.is_dir() and d.name not in oracles:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"INFO {d.name}: no oracle, {n} rows")
    # ——— binding-artifact key-set invariant (r10 verdict #7) ———
    # CORRECTNESS (this dump) and BENCH (bench_out.json) both enumerate
    # SparkEntry.queries; if their key sets diverge, one binding artifact is
    # stale and the round ships inconsistent counts. Full runs fail loudly on
    # any drift; partial runs (explicit query filter) skip the check, as does
    # --skip-benchcheck (for mid-round iteration before the next bench run).
    if not only and "--skip-benchcheck" not in sys.argv:
        bench_path = Path("/root/repo/bench_out.json")
        if bench_path.exists():
            try:
                bench = json.loads(bench_path.read_text())
                bench_keys = set(bench.get("queries", {})) | set(bench.get("failed", []))
                verify_keys = {d.name for d in Path(outdir).iterdir() if d.is_dir()}
                extra_v = sorted(verify_keys - bench_keys)
                extra_b = sorted(bench_keys - verify_keys)
                if extra_v or extra_b:
                    print(f"KEYSET MISMATCH correctness vs bench_out.json: "
                          f"only-in-correctness={extra_v} only-in-bench={extra_b} "
                          f"(rerun the bench, or pass --skip-benchcheck mid-round)")
                    n_fail += 1
                else:
                    print(f"keyset OK: correctness and bench_out.json both cover "
                          f"{len(verify_keys)} queries")
            except Exception as e:
                print(f"KEYSET CHECK FAILED: bench_out.json unreadable: {e}")
                n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
