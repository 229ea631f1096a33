#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only —
NOT part of the engine; the engine is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the sfDir parquet tables, then
compares: row count, column names (sorted), pandas dtypes (the driver
hashes through pandas, so a DuckDB HUGEINT → float64 vs Spark int64
divergence fails its gate even when every value is bit-identical —
round-6 root cause), and values (rows sorted by all columns, floats
rounded to 9 dp) — approximating the driver's row/schema/hash gate.
"""
import json
import math
import sys

import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def nonscalar_cols(cols, rows):
    """Columns holding list/array/dict cells. The driver's checker
    sorts rows with pandas lexsort, which throws `unhashable type:
    numpy.ndarray` on such columns (round-2 embed_quantize failure) —
    so the local gate must reject them too, never pass them."""
    if not rows:
        return []
    return [
        cols[i]
        for i in range(len(cols))
        if any(isinstance(r[i], (list, tuple, dict, bytearray, np.ndarray))
               for r in rows[:50])
    ]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Exact bit-pattern compare: the driver's pandas hash is
        # value-EXACT, so a decimal rounding here would make the local
        # gate more lenient than the one it approximates (round-7
        # advice: ewma's unrounded doubles could drift sub-1e-9 locally
        # yet fail the driver). hex() is the shortest exact rendering.
        return float(v).hex()
    return str(v)


def dtype_map(df):
    """Column → normalized pandas dtype, replicating what the driver's
    hash actually distinguishes: the RENDERED value class. Calibrated
    against CORRECTNESS_r06: int32-vs-int64 columns (datepart_derive,
    rank_suite, pq_codes, ...) hashed EQUAL at the driver (123 == 123),
    while int64-vs-float64 (embed_centroid's HUGEINT→float64 sum_q)
    hashed DIFFERENT (123 != 123.0). So: collapse integer widths and
    datetime resolutions; keep the int/float/bool/object/datetime kind
    distinction."""
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind  # i/u/f/b/O/M/m
        out[c] = {"i": "int", "u": "int", "f": "float", "b": "bool",
                  "M": "datetime", "m": "timedelta"}.get(k, str(df[c].dtype))
    return out


def norm_rows(cols, rows):
    # sort columns by name (driver convention), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # ONE fetch per side: the driver hashes through pandas, so
            # go straight to .df() and derive cols/rows/dtypes from the
            # same frame (round-7 advice: the old code ran each oracle
            # SQL twice just to re-fetch dtypes).
            g_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            w_df = con.execute(sql).df()
            g_cols = list(g_df.columns)
            g_rows = list(g_df.itertuples(index=False, name=None))
            w_cols = list(w_df.columns)
            w_rows = list(w_df.itertuples(index=False, name=None))
            g_dt = dtype_map(g_df)
            w_dt = dtype_map(w_df)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        bad_cols = nonscalar_cols(g_cols, g_rows) + nonscalar_cols(w_cols, w_rows)
        if bad_cols:
            print(
                f"FAIL {name}: non-scalar column(s) {sorted(set(bad_cols))} — "
                "the driver's pandas sort cannot hash these; csv-encode "
                "(array_join / array_to_string) or explode to scalar rows"
            )
            n_fail += 1
            continue
        gc, gr = norm_rows(g_cols, g_rows)
        wc, wr = norm_rows(w_cols, w_rows)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif any(g_dt.get(c) != w_dt.get(c) for c in gc):
            bad = {c: (g_dt.get(c), w_dt.get(c)) for c in gc
                   if g_dt.get(c) != w_dt.get(c)}
            print(f"FAIL {name}: dtype mismatch (spark, duckdb): {bad} — "
                  "the driver's pandas hash is dtype-sensitive; CAST the "
                  "oracle (HUGEINT sums → BIGINT) or the Spark column")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {gr[bad]}")
            print(f"  duckdb: {wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
