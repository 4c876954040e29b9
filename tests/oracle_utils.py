"""Local replica of the driver's oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables, then compares row count, column names, and values
order-insensitively. Floats are compared with a tight tolerance after
canonical rounding (queries are expected to round computed floats
themselves so the driver's exact value-hash can match).
"""

from __future__ import annotations

import math
import os

import duckdb

from boltzmannclean_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    # Bound the spill so a runaway oracle (wedge enumeration at the x30
    # replica spilled 70+ GB — round-10/11 lesson) fails ITS query loudly
    # instead of exhausting the disk under everything else. Override via
    # SPARK_GRAFT_ORACLE_SPILL for a deliberate solo heavy run.
    spill_cap = os.environ.get("SPARK_GRAFT_ORACLE_SPILL", "24GiB")
    con.execute(f"SET max_temp_directory_size='{spill_cap}'")
    # DuckDB's default memory_limit is ~80% of RAM; alongside a Spark
    # JVM on the same box that overcommits and the KERNEL oom-kills the
    # whole process (round-11 x30 sweep: three consecutive exit-137
    # deaths). Cap the oracle engine so engine + JVM fit; heavy oracles
    # spill (bounded above) instead of ballooning.
    mem_cap = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "40GiB")
    con.execute(f"SET memory_limit='{mem_cap}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the x10/x30
        # scale replicas); the driver's fixtures are single files. DuckDB
        # needs a glob for the former.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con.execute(sql).fetchdf()


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # Exact bit comparison — queries are responsible for producing
        # deterministic doubles (see functions/exact.py); the driver's
        # value-hash is assumed at least this strict.
        return ("f", v.hex())
    return (type(v).__name__[:1], str(v))


def driver_sort_canon(df_pandas, name: str = "?"):
    """Replicate the external harness's canonicalization exactly: pandas
    ``sort_values`` over every output column. Array/map/struct-typed cells
    make pandas raise ``TypeError: unhashable type`` there — round 2's
    only driver failure (``multimodal_features``) passed the *old* local
    canon because it accepted lists. Local green must imply driver green,
    so this is now the gate for every registered query, oracle or not."""
    cols = sorted(df_pandas.columns)
    try:
        return df_pandas[cols].sort_values(by=cols, kind="mergesort")
    except TypeError as e:  # unhashable cell (list/dict/ndarray)
        raise AssertionError(
            f"[{name}] output not canonicalizable by the driver's pandas "
            f"sort (non-atomic column?): {e}. Render arrays/maps as "
            f"strings in the registered output."
        ) from e


def canonical_rows(df_pandas, name: str = "?"):
    canon = driver_sort_canon(df_pandas, name=name)
    cols = list(canon.columns)
    rows = []
    for _, row in canon.iterrows():
        rows.append(tuple(_canon_cell(row[c]) for c in cols))
    return sorted(rows)


def assert_path_free(df_pandas, name: str, sf_dir: str):
    """No output cell may embed the input dir or an absolute testdata
    path: the driver runs at a different path/SF and would hash-mismatch
    (round-4 verdict #3 — e.g. a file-manifest query leaking
    `/root/testdata/sf0.01/...`)."""
    for col in df_pandas.columns:
        if df_pandas[col].dtype == object:
            for v in df_pandas[col].head(200):
                if isinstance(v, str):
                    assert sf_dir not in v and "/root/testdata" not in v, (
                        f"[{name}] column {col} embeds an input path "
                        f"({v!r}) — relativize the output"
                    )


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    sp = spark_df.toPandas()
    assert_path_free(sp, name, sf_dir)
    du = run_oracle(oracle_sql, sf_dir)
    assert sorted(sp.columns) == sorted(du.columns), (
        f"[{name}] column mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"[{name}] row count: spark={len(sp)} duckdb={len(du)}"
    sp_rows, du_rows = canonical_rows(sp, name=name), canonical_rows(du, name=name)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sp_rows, du_rows)) if a != b
    ]
    assert not mismatches, (
        f"[{name}] {len(mismatches)} value mismatches; first: {mismatches[0]}"
    )
