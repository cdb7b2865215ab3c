"""Multi-table orchestration — the table-level parallelism of the reference.

ape-dts runs snapshot tables as concurrent single-table tasks bounded by a
``tb_parallel_size`` semaphore (dt-task/src/task_runner.rs:256-303) and fans
CDC batches out per table (TableParallelizer, table_parallelizer.rs:86-114).
Here each logical table is its own lake directory + replay pipeline; the
runner drives up to ``tb_parallel`` of them concurrently from driver threads
(Ray schedules all their tasks jointly), honoring the TableFilter allow/deny
wildcards and the Router's table-name map.

Tables already finished (their event log fully committed, finished.log analog)
are skipped on resume — each table's own watermark handles that.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.stages.filter import TableFilter
from ape_dts_ray.stages.router import Router
from ape_dts_ray.state.lake import LakeTable


@dataclass
class TableJob:
    name: str                    # source table name (schema.table style ok)
    events_path: str | list[str] | None = None
    events_ds: object = None
    meta: TableMeta | None = None
    config: EngineConfig | None = None
    replay_kwargs: dict = field(default_factory=dict)


def run_tables(
    lake_root: str,
    jobs: list[TableJob],
    table_filter: TableFilter | None = None,
    router: Router | None = None,
    tb_parallel: int = 4,
) -> dict[str, list]:
    """Replay every allowed table, ≤ tb_parallel concurrently. Returns
    {target_table_name: committed manifests}."""
    from ape_dts_ray.pipelines.replay import replay

    table_filter = table_filter or TableFilter()
    router = router or Router()

    def run_one(job: TableJob):
        target = router.route_table(job.name)
        lake = LakeTable.create(
            f"{lake_root}/{target}",
            job.meta or TableMeta(name=target),
            job.config or EngineConfig(),
            if_exists="ignore")
        router_fn = router.batch_fn(job.name)
        return target, replay(lake, events_path=job.events_path,
                              events_ds=job.events_ds, router_fn=router_fn,
                              **job.replay_kwargs)

    allowed = [j for j in jobs if not table_filter.filtered(j.name)]
    results: dict[str, list] = {}
    with ThreadPoolExecutor(max_workers=max(1, tb_parallel)) as pool:
        for target, ms in pool.map(run_one, allowed):
            results[target] = ms
    return results
