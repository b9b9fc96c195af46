#!/usr/bin/env python3
"""Full-board DuckDB oracle replay over a Verify dump (local analog of the
driver's CORRECTNESS gate, used for the at-scale sf1 sweep — VERDICT r10
missing item 1).

Usage: python3 tools/oracle_replay.py <sfDir> <verifyOutDir> <reportJson> \
           [--only n1,n2,...] [--skip n1,n2,...]

For every <verifyOutDir>/<name>/ parquet dump with an entry in
oracle_sql.json it runs the oracle SQL against DuckDB views over
<sfDir>/*.parquet and reports rows_match / schema_match / hash_match,
mirroring the driver's contract: columns sorted by name, rows sorted by
their canonical string form, md5 over the canonical relation. Queries
without an oracle entry are recorded as err="no_oracle" (same as the
driver). The oracle column is CAST to the Spark-side type per column so
type-lattice differences (HUGEINT vs DECIMAL(38,0), etc.) don't produce
spurious value diffs — the Spark parquet schema is the declared contract.
"""
import argparse
import json, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_hash(con, rel_sql, cols):
    """md5 over the relation: columns sorted by name, canonical VARCHAR,
    rows sorted. NULL marked distinctly from the string 'NULL'."""
    cols = sorted(cols)
    parts = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(2))" for c in cols)
    q = (f"SELECT md5(COALESCE(string_agg(r, chr(10) ORDER BY r), '')) "
         f"FROM (SELECT concat_ws(chr(1), {parts}) AS r FROM ({rel_sql}))")
    return con.execute(q).fetchone()[0]


import re as _re


def split_ctes(sql):
    """Split a non-recursive `WITH name AS [MATERIALIZED] (body), ...
    <final select>` into ([(name, body), ...], final_select), or None
    when the SQL is not that shape (no WITH / WITH RECURSIVE / parse
    surprise). Paren balancing skips single-quoted strings (with ''
    escapes) and `--` line comments, both of which may contain parens.
    """
    s = sql.strip()
    if not _re.match(r"WITH\b", s, _re.IGNORECASE):
        return None
    if _re.match(r"WITH\s+RECURSIVE\b", s, _re.IGNORECASE):
        return None
    i, n, ctes = 4, len(s), []
    while True:
        m = _re.match(
            r'\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(?:MATERIALIZED\s+)?\(',
            s[i:], _re.IGNORECASE)
        if not m:
            return None
        name = m.group(1)
        j = i + m.end()
        depth, k = 1, j
        while k < n and depth > 0:
            c = s[k]
            if c == "'":
                k += 1
                while k < n:
                    if s[k] == "'":
                        if k + 1 < n and s[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == "-" and k + 1 < n and s[k + 1] == "-":
                while k < n and s[k] != "\n":
                    k += 1
                continue
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth != 0:
            return None
        ctes.append((name, s[j:k - 1]))
        m2 = _re.match(r"\s*,", s[k:])
        if m2:
            i = k + m2.end()
        else:
            return ctes, s[k:].strip()


def run_oracle_staged(con, sql):
    """Execute an oracle by materializing each depth-0 CTE into a TEMP
    TABLE in declaration order, then the final SELECT into __o_t, and
    expose the result as view __o. Semantically identical to running
    the WITH query whole (non-recursive CTEs are just named
    subqueries; each body sees the previously created names exactly as
    WITH scoping provides), but sidesteps DuckDB's CTE consumption
    pathology: a materialized-CTE scan carries no statistics, so the
    optimizer built hash tables on 50M-row candidate relations instead
    of the 20k-row vector side — emb_knn_graph ran 339 s as one WITH
    query vs 15 s staged (sf1, r14). Returns the list of temp names to
    drop (so a CTE named after a base view stops shadowing it for the
    NEXT oracle)."""
    parts = split_ctes(sql)
    created = []
    if parts is None:
        con.execute(f"CREATE OR REPLACE VIEW __o AS {sql}")
        return created
    ctes, final = parts
    try:
        for name, body in ctes:
            con.execute(f'CREATE OR REPLACE TEMP TABLE "{name}" AS {body}')
            created.append(name)
        con.execute(f"CREATE OR REPLACE TEMP TABLE __o_t AS {final}")
    finally:
        # drop the CTE temps immediately: __o only needs __o_t, memory
        # frees early, and a CTE named after a base view stops
        # shadowing it for the next oracle
        for name in created:
            try:
                con.execute(f'DROP TABLE IF EXISTS "{name}"')
            except Exception:  # noqa: BLE001
                pass
    con.execute("CREATE OR REPLACE VIEW __o AS SELECT * FROM __o_t")
    return ["__o_t"]


def py_oracle_mm_phash_groups(con, oracle):
    """Union-find transitive closure of the pHash near-dup pair graph.

    The registered SQL oracle for mm_phash_groups closes the graph with
    a recursive CTE (reach(a,b)), which materializes ALL-PAIRS
    reachability — quadratic in component size. On the sf1 media graph
    (near-clique) that runs for hours and was declared oracle-infeasible
    in SF1_R13_DELTA (r13 verdict item 3). The edge semantics stay
    pinned to SQL: the pair relation is the mm_phash_pairs REGISTERED
    ORACLE verbatim; only the closure moves to an O(E alpha(E)) Python
    union-find with union-by-min, whose root invariant (the root of
    every set is its minimum member) IS the engine's min-label
    convention: group_id = component min. Returns rows for every vertex
    of the pair graph, exactly like `SELECT a, LEAST(a, MIN(b)) FROM
    reach GROUP BY a` (cross-checked hash-identical against the
    recursive CTE at sf0.01 before landing).
    """
    pairs_sql = oracle.get("mm_phash_pairs")
    if not pairs_sql:
        raise RuntimeError("mm_phash_pairs oracle missing (edge source)")
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in con.execute(
            f"SELECT da, db FROM ({pairs_sql})").fetchall():
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(v, find(v)) for v in parent]
    con.execute("CREATE OR REPLACE TEMP TABLE __py_rows "
                "(doc_id BIGINT, group_id BIGINT)")
    con.executemany("INSERT INTO __py_rows VALUES (?, ?)", rows)
    con.execute("CREATE OR REPLACE VIEW __o AS "
                "SELECT doc_id, group_id FROM __py_rows")


# Oracles whose registered SQL is correct but at-scale-infeasible in
# DuckDB; each entry builds the __o view Python-side from the SAME
# registered relations. Disable with REPLAY_PY_ORACLES=0 to force the
# raw SQL (the cross-check mode used at small SFs).
PY_ORACLES = {"mm_phash_groups": py_oracle_mm_phash_groups}


def parse_args():
    ap = argparse.ArgumentParser(
        description="DuckDB oracle replay over a graft.Verify dump")
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("report")
    ap.add_argument("--only", help="comma-separated query names to run")
    ap.add_argument("--skip", help="comma-separated query names to skip")
    return ap.parse_args()


def main():
    a = parse_args()
    sf_dir, out_dir, report = a.sf_dir, a.out_dir, a.report
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute(f"SET threads TO "
                f"{int(os.environ.get('REPLAY_THREADS', min(os.cpu_count() or 8, 16)))}")
    # Bound per-process memory so parallel partition replays don't each
    # claim DuckDB's default 80%-of-RAM and OOM the box; large sorts
    # spill to the temp dir instead.
    con.execute(f"SET memory_limit = "
                f"'{os.environ.get('REPLAY_MEM', '24GB')}'")
    # per-PID spill dir: parallel replay processes must not share one
    # (DuckDB instances overwrite each other's duckdb_temp_storage files)
    con.execute(
        f"SET temp_directory = '/tmp/duckdb_replay_spill_{os.getpid()}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    results, n_pass, n_fail = {}, 0, 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    only = set(a.only.split(",")) if a.only else None
    skip = set(a.skip.split(",")) if a.skip else set()
    if only is not None:
        names = [n for n in names if n in only]
    names = [n for n in names if n not in skip]

    def dump_report():
        with open(report, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "env": {"duckdb": duckdb.__version__,
                               "python": sys.version.split()[0]},
                       "n_queries": len(names), "n_pass": n_pass,
                       "n_fail": n_fail, "results": results}, f, indent=1)

    for name in names:
        t0 = time.time()
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": None}
        try:
            srel = f"SELECT * FROM '{spark_glob}'"
            sdesc = con.execute(f"DESCRIBE {srel}").fetchall()
            scols = {r[0]: r[1] for r in sdesc}
            row["spark_rows"] = con.execute(
                f"SELECT count(*) FROM ({srel})").fetchone()[0]
            if name not in oracle:
                row["err"] = "no_oracle"
                row["sec"] = round(time.time() - t0, 2)
                results[name] = row
                print(f"[replay] {name}: no_oracle", flush=True)
                dump_report()
                continue
            staged_tables = []
            if (name in PY_ORACLES
                    and os.environ.get("REPLAY_PY_ORACLES", "1") != "0"):
                PY_ORACLES[name](con, oracle)
                row["oracle"] = "python"
            elif os.environ.get("REPLAY_STAGED", "1") != "0":
                staged_tables = run_oracle_staged(con, oracle[name])
                if staged_tables:
                    row["oracle"] = "staged"
            else:
                con.execute(f"CREATE OR REPLACE VIEW __o AS {oracle[name]}")
            odesc = con.execute("DESCRIBE __o").fetchall()
            ocols = [r[0] for r in odesc]
            row["oracle_rows"] = con.execute(
                "SELECT count(*) FROM __o").fetchone()[0]
            row["rows_match"] = row["spark_rows"] == row["oracle_rows"]
            row["schema_match"] = sorted(scols) == sorted(ocols)
            if row["schema_match"]:
                # cast oracle cols to the Spark parquet types (the contract)
                cast_sel = ", ".join(
                    f'CAST("{c}" AS {scols[c]}) AS "{c}"' for c in ocols)
                h_s = canon_hash(con, srel, list(scols))
                h_o = canon_hash(con, f"SELECT {cast_sel} FROM __o", ocols)
                row["hash_match"] = h_s == h_o
        except Exception as e:  # noqa: BLE001 — record and continue
            row["err"] = f"{type(e).__name__}: {e}"[:300]
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        n_pass += 1 if ok else 0
        n_fail += 0 if ok or row["err"] == "no_oracle" else 1
        print(f"[replay] {name}: "
              f"{'PASS' if ok else (row['err'] or 'FAIL')}"
              f" ({row['sec']}s)", flush=True)
        dump_report()

    dump_report()
    print(f"[replay] {n_pass} pass / {n_fail} fail / "
          f"{len(names) - n_pass - n_fail} no_oracle -> {report}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
