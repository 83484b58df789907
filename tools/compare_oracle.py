#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query with an
oracle, run the oracle SQL in DuckDB over the sf tables and hash-compare
against the Spark parquet output (columns sorted by name). Rows-only queries:
report row count."""
import duckdb, json, sys, glob, os, hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    p = f'{sf_dir}/{t}.parquet'
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))

def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    # Replicate the DRIVER's row sort: pandas sort_values throws
    # "unhashable type: numpy.ndarray" on array cells — exactly the failure
    # that err'ed 8 CORRECTNESS rows in round 6 while this tool's old
    # stringify-then-hash path false-greened them. A TypeError here means
    # the output is DRIVER-INCOMPATIBLE, and the caller reports it as such.
    df = df.sort_values(by=list(df.columns))
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False)]
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), h, rows

fails = 0
for qdir in sorted(glob.glob(f'{out_dir}/q*')):
    name = os.path.basename(qdir)
    pq = glob.glob(f'{qdir}/*.parquet')
    if not pq:
        if os.path.exists(f'{qdir}/_FAILED.json'):
            print(f'{name:26s} FAILED {open(f"{qdir}/_FAILED.json").read()[:120]}')
        else:
            print(f'{name:26s} NO-OUTPUT')
        fails += 1; continue
    try:
        n_spark, h_spark, rows_spark = canon(con.sql(f"SELECT * FROM '{pq[0]}'"))
    except TypeError as e:
        print(f'{name:26s} DRIVER-INCOMPATIBLE (non-scalar column): {e}')
        fails += 1; continue
    if name in oracle:
        try:
            n_o, h_o, rows_o = canon(con.sql(oracle[name]))
        except Exception as e:
            print(f'{name:26s} ORACLE-ERROR {e}'); fails += 1; continue
        ok = (h_spark == h_o)
        print(f'{name:26s} {"MATCH" if ok else "MISMATCH"} spark={n_spark} oracle={n_o}')
        if not ok:
            fails += 1
            sset, oset = set(rows_spark), set(rows_o)
            for r in list(sset - oset)[:3]: print('   spark-only:', r)
            for r in list(oset - sset)[:3]: print('   oracle-only:', r)
            if sset == oset: print('   (same set, different ORDER)')
    else:
        print(f'{name:26s} rows-only n={n_spark}' + ('  ** EMPTY **' if n_spark == 0 else ''))
        if n_spark == 0: fails += 1
print('FAILS:', fails)
