"""Task-level fault injection: a worker process dies mid-stage, Ray retries
the task, and exactly-once still holds (deterministic delta names make the
retry overwrite, not duplicate) — the engine-side counterpart of the
driver-crash test in test_replay.py."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.state.lake import LakeTable
from ape_dts_ray.testing import CrashOnce


@pytest.mark.usefixtures("ray_session")
def test_worker_crash_mid_stage_retries_exactly_once(tmp_path):
    events = gen_events(seed=55, n_convs=25, max_turns=6, n_events=3000,
                        delete_frac=0.2)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)

    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=8, epoch_size=1000))
    marker = str(tmp_path / "crashed.marker")
    replay(lake, events_path=path, event_filter=CrashOnce(marker))
    assert os.path.exists(marker), "the fault was never injected"

    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])
