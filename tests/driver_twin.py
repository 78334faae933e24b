"""Driver-twin correctness check: run the registry prefix exactly like
the driver's gate (sf0.01, DuckDB oracle, columns sorted by name,
order-insensitive value compare). Usage:

    python tests/driver_twin.py [n_queries] [sf_dir]

Prints one JSON line per query and a summary. Owns its own Ray session
(standalone script, not imported by the driver).
"""

import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_df(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    names = list(queries)[:N]
    bad = []
    for name in names:
        rec = {"q": name}
        try:
            got = normalize(to_df(queries[name](SF)))
            if name not in oracles:
                rec["status"] = "rows_only"
                rec["rows"] = len(got)
            else:
                want = normalize(con.execute(oracles[name]).fetchdf())
                rec["rows"] = len(got)
                rec["oracle_rows"] = len(want)
                if len(got) != len(want):
                    rec["status"] = "ROWS_MISMATCH"
                elif list(got.columns) != list(want.columns):
                    rec["status"] = "SCHEMA_MISMATCH"
                    rec["cols"] = [list(got.columns), list(want.columns)]
                else:
                    try:
                        pd.testing.assert_frame_equal(
                            got, want, check_dtype=False, atol=1e-5
                        )
                        rec["status"] = "ok"
                    except AssertionError as e:
                        rec["status"] = "HASH_MISMATCH"
                        rec["detail"] = str(e)[:200]
        except Exception as e:  # noqa: BLE001
            rec["status"] = "ERROR"
            rec["detail"] = f"{type(e).__name__}: {e}"[:300]
        if rec["status"] not in ("ok", "rows_only"):
            bad.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total": len(names), "bad": bad}), flush=True)
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
