#!/usr/bin/env python3
"""DuckDB half of the PortableMath cross-engine parity sweep.

Evaluates the exact plogSql/pexpSql expression strings the oracle twins
inline (dumped by `runMain graft.tools.PortableMathDump`) over the same
inputs in the INSTALLED DuckDB, and bit-compares against the JVM scalar
values. A 0-mismatch artifact pins "this DuckDB version computes the
portable-math family bit-identically to the JVM" — the environment
contract every hash-exact ln/exp/sigmoid oracle rides on.

Usage: python3 tools/portable_math_parity.py <dumpDir> [reportJson]
"""
import json
import struct
import sys

import duckdb


def bits(v: float) -> int:
    return struct.unpack("<q", struct.pack("<d", v))[0]


def main():
    dump = sys.argv[1]
    report = sys.argv[2] if len(sys.argv) > 2 else None
    con = duckdb.connect()
    exprs = json.load(open(f"{dump}/sql_exprs.json"))
    con.execute(
        "CREATE TABLE t AS SELECT * FROM read_csv_auto("
        f"'{dump}/jvm_values.csv', header=true)")
    n = con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
    out = {"duckdb_version": duckdb.__version__, "n_inputs": n}
    total_bad = 0
    for name, jvm_col in (("plog", "plog_bits"), ("pexp_neg", "pexp_neg_bits")):
        rows = con.execute(
            f"SELECT x, {jvm_col}, ({exprs[name]}) FROM t").fetchall()
        bad = [(x, j, bits(d)) for x, j, d in rows if bits(d) != j]
        out[name] = {"n_mismatch": len(bad),
                     "worst": [{"x": x, "jvm_bits": j, "duckdb_bits": b}
                               for x, j, b in bad[:5]]}
        total_bad += len(bad)
        print(f"{name}: {len(bad)}/{len(rows)} bit mismatches")
    if report:
        json.dump(out, open(report, "w"), indent=1)
    print(f"portable-math parity vs duckdb {duckdb.__version__}: "
          f"{'CLEAN' if total_bad == 0 else f'{total_bad} MISMATCHES'}")
    sys.exit(0 if total_bad == 0 else 1)


if __name__ == "__main__":
    main()
