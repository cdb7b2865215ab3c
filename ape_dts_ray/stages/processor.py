"""User-extension hook — the LuaProcessor analog (dt-pipeline/src/
lua_processor.rs:14-53; docs/en/etl/lua.md).

The reference exposes each row to a Lua script as mutable globals
``{schema, tb, row_type, before, after}``; the script may add/drop/modify
columns, change the row type, or drop the row. In Ray Data the strictly more
natural surface is a user Python function over an Arrow batch, plugged into
``replay(router_fn=...)`` (or any ``map_batches``). ``UserProcessor`` wraps
such a function with the engine's invariants so user code cannot corrupt the
apply stage:

- the engine columns (log_offset, seq, op) and PK columns must survive;
- op values must stay in the insert/update/delete alphabet;
- dropping rows = returning a filtered batch (row_type = "" in Lua).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

from ape_dts_ray.meta import COL_OFFSET, COL_OP, COL_SEQ, OPS


class ProcessorError(ValueError):
    pass


class UserProcessor:
    def __init__(self, fn: Callable[[pa.Table], pa.Table],
                 key_cols: tuple[str, ...] = ("conv_id", "turn_idx")):
        self.fn = fn
        self.key_cols = key_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.fn(batch)
        if not isinstance(out, pa.Table):
            raise ProcessorError(
                f"processor must return a pyarrow.Table, got {type(out)}")
        required = [COL_OFFSET, COL_OP, *self.key_cols]
        if COL_SEQ in batch.column_names:
            # seq must survive when the INPUT carried it (the module
            # contract) — dropping it would fail far downstream inside the
            # shuffle's lww ordering instead of at this boundary
            required.append(COL_SEQ)
        missing = [c for c in required if c not in out.column_names]
        if missing:
            raise ProcessorError(f"processor dropped required columns {missing}")
        if out.num_rows:
            bad = pc.invert(pc.is_in(out.column(COL_OP), value_set=pa.array(OPS)))
            if pc.any(bad).as_py():
                raise ProcessorError("processor produced invalid op values")
        return out
