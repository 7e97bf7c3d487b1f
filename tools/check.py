#!/usr/bin/env python3
"""Local correctness checker mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [names...]

Runs graft.Verify (sbt) to dump each SparkEntry query to parquet + the
oracle SQL json, then for each query: registers every table of the sf dir
as a DuckDB view, runs the oracle SQL, and compares to the Spark parquet —
column names (sorted), row count, dtypes, and cell values (exact; row
order-insensitive via sorted hash like the driver).

Writes the driver-schema artifact CORRECTNESS_local.json — per query
{rows_match, schema_match, hash_match, err} — to the outdir, and (on a
FULL run: no name filter) also to the repo root so it can be committed at
HEAD each round. The summary line is derived from that artifact.
"""
import json, os, subprocess, sys

import duckdb

def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    sfdir = args[0] if len(args) > 0 else '/root/testdata/sf0.001'
    outdir = args[1] if len(args) > 1 else '/tmp/verify_out'
    only = set(args[2:])
    if '--skip-verify' not in sys.argv:
        r = subprocess.run(
            ['sbt', '-batch', f'runMain graft.Verify {sfdir} {outdir}'],
            capture_output=True, text=True, cwd='/root/repo')
        tail = '\n'.join((r.stdout + r.stderr).splitlines()[-30:])
        if r.returncode != 0:
            print('VERIFY FAILED:\n', tail); sys.exit(1)
        for line in (r.stdout + r.stderr).splitlines():
            if '[verify]' in line:
                print(line)

    # Verify emits each oracle under both `<name>` and `<name>.parquet`
    # (the driver looks up by output-dir name, suffix included) — collapse
    # to bare names here.
    oracle = {}
    for k, v in json.load(open(f'{outdir}/oracle_sql.json')).items():
        oracle[k[:-8] if k.endswith('.parquet') else k] = v
    verify_errs = {}
    try:
        verify_errs = json.load(open(f'{outdir}/verify_errors.json'))
    except Exception:
        pass
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders',
              'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    # driver schema: {query: {rows_match, schema_match, hash_match, err}}
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res = {'rows_match': False, 'schema_match': False,
               'hash_match': False, 'err': None}
        results[name] = res
        pq = f'{outdir}/{name}.parquet'
        if not os.path.isdir(pq):
            res['err'] = verify_errs.get(name, 'no spark output')
            print(f"FAIL {name}: {res['err']}"); continue
        try:
            got = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
            want = con.sql(oracle[name])
            gcols, wcols = list(got.columns), list(want.columns)
            if sorted(gcols) != sorted(wcols):
                res['err'] = f'columns {sorted(gcols)} != {sorted(wcols)}'
                print(f'FAIL {name}: {res["err"]}')
                continue
            sel_g = ', '.join(f'"{c}"' for c in sorted(gcols))
            sel_w = ', '.join(f'"{c}"' for c in sorted(wcols))
            gt = [tuple(str(x) for x in row) for row in
                  con.sql(f"SELECT {sel_g} FROM got").fetchall()]
            wt = [tuple(str(x) for x in row) for row in
                  con.sql(f"SELECT {sel_w} FROM want").fetchall()]
            gtypes = dict(zip(got.columns, [str(t) for t in got.types]))
            wtypes = dict(zip(want.columns, [str(t) for t in want.types]))
            tmis = {c: (gtypes[c], wtypes[c]) for c in gtypes
                    if gtypes[c] != wtypes[c]}
            res['rows_match'] = len(gt) == len(wt)
            res['schema_match'] = not tmis
            res['hash_match'] = res['rows_match'] and sorted(gt) == sorted(wt)
            if not res['rows_match']:
                print(f'FAIL {name}: rows {len(gt)} != {len(wt)}')
            elif not res['hash_match']:
                bad = [(a, b) for a, b in zip(sorted(gt), sorted(wt)) if a != b]
                print(f'FAIL {name}: {len(bad)} value diffs; first: got={bad[0][0]} want={bad[0][1]}')
                print(f'     cols={sorted(gcols)}')
            elif tmis:
                print(f'WARN {name}: dtype mismatch {tmis} (values match)')
            else:
                print(f'pass {name} ({len(gt)} rows)')
        except Exception as e:
            res['err'] = f'{type(e).__name__}: {str(e)[:300]}'
            print(f'FAIL {name}: {res["err"]}')
    # queries without oracle: rows-only
    for name in sorted(os.listdir(outdir)):
        base = name[:-8] if name.endswith('.parquet') else name
        if name.endswith('.json') or base in oracle or (only and base not in only):
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
            name = base
            print(f'rows-only {name}: {n} rows')
        except Exception as e:
            print(f'rows-only {name}: ERR {e}')

    # the artifact IS the result: write it, then summarize FROM it
    art = json.dumps(results, indent=1, sort_keys=True)
    with open(f'{outdir}/CORRECTNESS_local.json', 'w') as f:
        f.write(art)
    if not only:  # full battery -> committable snapshot at the repo root
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo_root, 'CORRECTNESS_local.json'), 'w') as f:
            f.write(art)
    n_pass = sum(1 for r in results.values()
                 if r['hash_match'] and not r['err'])
    n_fail = len(results) - n_pass
    print(f'== {n_pass} pass, {n_fail} fail '
          f'(CORRECTNESS_local.json: {len(results)} entries)')
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
