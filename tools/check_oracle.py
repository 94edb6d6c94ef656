#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (driver-side python only —
not part of the shipped engine). Runs after `sbt "runMain graft.Verify <sf> <out>"`:
for each query, loads the Spark parquet result and the DuckDB oracle result,
sorts columns by name and rows by all columns, normalizes values, and diffs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def frame_types(con, sql):
    """Column name -> DuckDB logical type, via DESCRIBE so both the oracle
    query and the Spark parquet read-back land in the same type namespace.
    The driver's hash is TYPE-SENSITIVE: an untyped SUM(BIGINT) that DuckDB
    widens to HUGEINT fails the driver even when every value matches (the
    round-5 d25/e16/t17/t23 defect class). Normalizations below cover the
    representation gaps the driver demonstrably tolerates:
      - TIMESTAMP WITH TIME ZONE vs TIMESTAMP (Spark writes UTC-adjusted
        int64 parquet timestamps; DuckDB reads those as TIMESTAMPTZ while
        the oracle side computes plain TIMESTAMP — driver-green queries
        like e4_asof_join span this gap).
    """
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    out = {}
    for r in rows:
        t = r[1].upper()
        if t == "TIMESTAMP WITH TIME ZONE":
            t = "TIMESTAMP"
        out[r[0]] = t
    return out


def frame_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def pandas_path_check(con, oracle_sql, spark_files):
    """Second-opinion comparison through the driver's pandas conversion
    path; returns "OK" or a PANDAS-PATH failure string."""
    import pandas as pd  # noqa: F401 (duckdb .df() needs it importable)
    import pyarrow.parquet as pq
    try:
        odf = con.execute(oracle_sql).df()
        sdf = pq.ParquetDataset(spark_files).read().to_pandas()
    except Exception as e:
        return f"PANDAS-PATH-ERROR {e}"
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        return f"PANDAS-PATH SCHEMA want={ocols} got={scols}"

    def canon2(v):
        # DATE columns arrive as datetime.date from pyarrow but as
        # midnight datetime64 from duckdb .df(); driver-green queries
        # (e8/e17/p22/s5/w8 in r11) prove the driver tolerates exactly
        # this gap, so mirror that one tolerance — and nothing else
        # (NaN-vs-NULL stays a failure: that was the j2 driver red).
        s = canon(v)
        return s[:-9] if s.endswith(" 00:00:00") else s

    orows = sorted(tuple(canon2(v) for v in row)
                   for row in odf[ocols].itertuples(index=False, name=None))
    srows = sorted(tuple(canon2(v) for v in row)
                   for row in sdf[scols].itertuples(index=False, name=None))
    if len(orows) != len(srows):
        return (f"PANDAS-PATH ROWS oracle={len(orows)} spark={len(srows)} — "
                "green on fetchall but red through pandas = will be red on the DRIVER")
    if orows != srows:
        # equal lengths guaranteed above, so the zip-based locator is total
        bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
        return (f"PANDAS-PATH VALUES first-diff row {bad}: "
                f"oracle={orows[bad][:6]} spark={srows[bad][:6]} — green on "
                "fetchall but red through pandas = will be red on the DRIVER")
    return "OK"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            want_cols, want = frame_rows(con, sql)
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        spark_sql = f"SELECT * FROM read_parquet({files!r})"
        try:
            got_cols, got = frame_rows(con, spark_sql)
        except Exception as e:
            results[name] = f"SPARK-READ-ERROR {e}"
            continue
        try:
            want_types = frame_types(con, sql)
            got_types = frame_types(con, spark_sql)
        except Exception as e:
            results[name] = f"DESCRIBE-ERROR {e}"
            continue
        type_diff = {c: (want_types.get(c), got_types.get(c))
                     for c in set(want_types) | set(got_types)
                     if want_types.get(c) != got_types.get(c)}
        # The driver canonicalizes frames through pandas sort_values, which
        # CRASHES on array/struct/map cells ("unhashable type: numpy.ndarray",
        # the round-6 p30 defect). The mirror must be strictly stricter than
        # the driver, so any complex-typed output column is a hard fail here:
        # serialize it (concat_ws/array_to_string) before gating the query.
        complex_cols = {c: t for src in (want_types, got_types)
                        for c, t in src.items()
                        if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY", "UNION"))}
        if complex_cols:
            results[name] = (f"COMPLEX-TYPE driver cannot hash {complex_cols} — "
                             "serialize to string on both engines")
        elif want_cols != got_cols:
            results[name] = f"SCHEMA want={want_cols} got={got_cols}"
        elif type_diff:
            results[name] = f"TYPES oracle-vs-spark diff {type_diff}"
        elif len(want) != len(got):
            results[name] = f"ROWS want={len(want)} got={len(got)}"
        elif want != got:
            bad = next(i for i, (a, b) in enumerate(zip(want, got)) if a != b)
            results[name] = f"VALUES first-diff row {bad}: want={want[bad][:6]} got={got[bad][:6]}"
        else:
            # The fetchall comparison above passed — now replay the
            # PANDAS-path canonicalization the driver demonstrably uses
            # (the two-round j2 red): the oracle side through duckdb
            # `.df()` (DECIMAL → float64, NULL → NaN, 17.50 → '17.5') and
            # the Spark side through a pyarrow read (Decimal/None
            # preserved). A query green on fetchall but red here WILL be
            # red on the driver — typically a nullable small-precision
            # DECIMAL output; serialize it as canonical VARCHAR on both
            # engines in the gate projection.
            results[name] = pandas_path_check(con, sql, files)
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else f" :: {v}"))
    print(f"\n{n_ok}/{len(results)} match")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
