"""Driver-contract conformance: run every ``queries()`` entry at sf0.01 and
compare against its ``oracle_sql()`` DuckDB result — row count, column set,
and full order-insensitive value equality (EXCEPT ALL both ways). This is a
local replica of the driver's CORRECTNESS gate."""

import duckdb
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_arrow(result) -> pa.Table:
    if isinstance(result, pa.Table):
        return result
    if hasattr(result, "iter_batches"):   # ray Dataset
        batches = list(result.iter_batches(batch_format="pyarrow"))
        return pa.concat_tables(batches) if batches else pa.table({})
    return pa.Table.from_pandas(result, preserve_index=False)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


NAMES = sorted(entrymod.queries().keys())

# scale-sensitive queries re-checked at sf0.1: multi-epoch windows
# (lineage), multi-block pair joins (embedding), LSH recall at corpus size
# (minhash), and the flagship replay. Caught a real oracle bug once:
# DuckDB CAST(x/50000 AS BIGINT) ROUNDS — it split keys mid-epoch only
# when offsets exceeded one epoch.
SF01_NAMES = ["cdc_apply_lww", "cdc_lineage_totals", "dedup_embedding",
              "dedup_minhash", "cdc_wide_types", "redis_replay",
              "redis_incremental",  # multi-segment watermark advance at scale
              "cdc_mongo_doc",  # crash+resume crosses real epoch boundaries
              "cdc_two_way",   # two_way: growing-log tail only bites with
                               # multi-epoch windows (n > epoch_size)
              "cdc_follow",    # follow: wave boundaries mid-epoch → tail
                               # recommit path only exercised at sf0.1
              "cdc_follow_mixed"]  # same tail-recommit reach, through the
                                   # mixed fan-out's shared epoch geometry


@pytest.fixture(scope="module")
def con01():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"'/root/testdata/sf0.1/{t}.parquet'")
    return c


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SF01_NAMES)
def test_query_matches_oracle_sf01(name, con01):
    res = _to_arrow(entrymod.queries()[name]("/root/testdata/sf0.1"))
    ora = con01.sql(entrymod.oracle_sql()[name]).arrow()
    assert res.num_rows == ora.num_rows, (res.num_rows, ora.num_rows)
    cols = ", ".join(f'"{c}"' for c in sorted(res.column_names))
    con01.register("res_tbl", res)
    con01.register("ora_tbl", ora)
    extra = con01.sql(
        f"SELECT {cols} FROM res_tbl EXCEPT ALL SELECT {cols} FROM ora_tbl"
    ).fetchmany(3)
    missing = con01.sql(
        f"SELECT {cols} FROM ora_tbl EXCEPT ALL SELECT {cols} FROM res_tbl"
    ).fetchmany(3)
    assert not extra and not missing, {"extra": extra, "missing": missing}
    con01.unregister("res_tbl")
    con01.unregister("ora_tbl")


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, con):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    if name not in sqls:
        # rows-only contract (driver's weaker check): runs, returns rows,
        # and is deterministic across invocations
        r1, r2 = _to_arrow(q(SF_DIR)), _to_arrow(q(SF_DIR))
        assert r1.num_rows == r2.num_rows
        assert sorted(map(tuple, r1.to_pylist()[0].items())) == \
               sorted(map(tuple, r2.to_pylist()[0].items())) if r1.num_rows else True
        return
    res = _to_arrow(q(SF_DIR))
    ora = con.sql(sqls[name]).arrow()
    assert res.num_rows == ora.num_rows, (res.num_rows, ora.num_rows)
    assert set(res.column_names) == set(ora.column_names), (
        res.column_names, ora.column_names)
    cols = ", ".join(f'"{c}"' for c in sorted(res.column_names))
    con.register("res_tbl", res)
    con.register("ora_tbl", ora)
    extra = con.sql(
        f"SELECT {cols} FROM res_tbl EXCEPT ALL SELECT {cols} FROM ora_tbl"
    ).fetchmany(5)
    missing = con.sql(
        f"SELECT {cols} FROM ora_tbl EXCEPT ALL SELECT {cols} FROM res_tbl"
    ).fetchmany(5)
    assert not extra and not missing, {"extra": extra, "missing": missing}
    con.unregister("res_tbl")
    con.unregister("ora_tbl")
