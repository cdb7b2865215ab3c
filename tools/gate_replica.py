"""Replica of the driver's correctness gate: run every ``queries()`` entry
at a given sf dir, run the matching ``oracle_sql()`` in DuckDB over the same
parquet tables (pre-registered as views, like the driver), and compare
row count, schema (column names, sorted), and a value hash computed over
name-sorted columns — the same compare shape TESTDATA.md describes.

Usage: python tools/gate_replica.py [/root/testdata/sf0.01]

Owns its Ray session (library code never calls ray.init).
"""
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # sort rows by every column for a stable hash (driver sorts values)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _hash(df):
    import pandas as pd
    parts = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            s = col.astype(str)
        elif str(col.dtype).startswith("float"):
            s = col.round(6).astype(str)
        else:
            s = col.astype(str)
        parts.append(s)
    blob = "\x1f".join("\x1e".join(p.tolist()) for p in parts)
    return hashlib.md5(blob.encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd
    import pyarrow as pa

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results, bad = {}, 0
    for name, fn in qs.items():
        t0 = time.time()
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": None}
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = pa.table(res).to_pandas()
            if name not in oracles:
                row["err"] = "no_oracle"
                row["rows"] = len(res)
            else:
                odf = con.execute(oracles[name]).fetchdf()
                a, b = _canon(res), _canon(odf)
                row["rows_match"] = len(a) == len(b)
                row["schema_match"] = list(a.columns) == list(b.columns)
                row["hash_match"] = (row["rows_match"] and
                                     row["schema_match"] and
                                     _hash(a) == _hash(b))
                row["rows"] = len(a)
                row["oracle_rows"] = len(b)
                if not row["hash_match"]:
                    bad += 1
        except Exception as e:  # noqa: BLE001 — gate must survive one bad query
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            bad += 1
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        ok = ("MATCH" if row["hash_match"] else
              ("rows-only" if row["err"] == "no_oracle" else "BAD"))
        print(f"{name:28s} {ok:10s} {row['sec']:6.2f}s "
              f"{row.get('rows', '?')}", flush=True)

    print(json.dumps({"bad": bad, "n": len(results)}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
