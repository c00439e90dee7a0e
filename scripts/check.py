#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata parquet, then
canonicalizes both (sort columns by name, round floats, sort rows) and compares.
"""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, round floats to 6 significant-ish digits, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                elif v == 0:
                    v = 0.0
                else:
                    v = round(v, 6 - 1 - int(math.floor(math.log10(abs(v)))))
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out

def fresh_con(sfdir):
    # one connection PER QUERY: DuckDB working memory accumulates across a
    # long replay session (the r10 sf1 run cascade-OOM'd from one query on),
    # and an OOM poisons every later query on the same connection. A bounded
    # memory limit + disk spill keeps the big oracles honest out-of-core.
    con = duckdb.connect()
    try:
        # GRAFT_CHECK_MEMLIMIT: per-query DuckDB cap (default 24GB; "none"
        # = DuckDB's default 80%-of-RAM — needed by the heaviest oracles,
        # e.g. q108's tokenizing NB replay at sf1)
        lim = os.environ.get("GRAFT_CHECK_MEMLIMIT", "24GB")
        if lim.lower() != "none":
            con.execute(f"SET memory_limit='{lim}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    except Exception:
        pass
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        # driver testdata = single files; ScaleTrend replicas = Spark-written
        # directories of part files — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query-name filter for re-runs
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # only query dirs: Verify also writes bookkeeping dirs (plan_drift/)
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)) and d in oracles)
    if only is not None:
        names = [n for n in names if n in only]
    for name in names:
        con = fresh_con(sfdir)
        try:
            n_pass, n_fail = check_one(con, outdir, name, oracles, n_pass, n_fail)
        finally:
            con.close()
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

def check_one(con, outdir, name, oracles, n_pass, n_fail):
        spark_glob = os.path.join(outdir, name, "*.parquet")
        try:
            sq = con.execute(f"SELECT * FROM '{spark_glob}'")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            return n_pass, n_fail + 1
        if name not in oracles:
            status = "ROWS-ONLY" if srows else "ROWS-ONLY-EMPTY?"
            print(f"{status} {name}: {len(srows)} rows (no oracle)")
            return n_pass, n_fail
        try:
            oq = con.execute(oracles[name])
            ocols = [d[0] for d in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            return n_pass, n_fail + 1
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            n_fail += 1
            print(f"FAIL {name}: {len(sr)} vs {len(orr)} rows; first diffs:")
            diffs = 0
            for a, b in zip(sr, orr):
                if a != b:
                    print(f"  spark={a}\n  duck ={b}")
                    diffs += 1
                    if diffs >= 3:
                        break
            if len(sr) != len(orr):
                only_s = set(sr) - set(orr)
                only_o = set(orr) - set(sr)
                for x in list(only_s)[:3]: print(f"  only-spark: {x}")
                for x in list(only_o)[:3]: print(f"  only-duck : {x}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sr)} rows")
        return n_pass, n_fail

if __name__ == "__main__":
    main()
