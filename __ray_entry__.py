"""Driver contract for ape_dts_ray (Ray Data CDC / incremental-ingest engine).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.

Every CDC query replays the change stream derived from the ``events`` view
(ape_dts_ray/sources/derive.py — derivation implemented once in Arrow and once
as the ``changes`` CTE below, kept in lockstep) through the real engine:
fresh /tmp lake, normalize → hash shuffle → LWW apply → manifest commit →
merge-on-read state. Operator coverage map: SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ape_dts_ray.sources.derive import (CHANGES_CTE, DCL_CTE, MONGO_CTE,
                                        WIDE_CTE)


def _stopword_values() -> str:
    """VALUES list for the langid oracle, generated from the SAME stopword
    tables the Ray stage uses (ape_dts_ray/functions/text.py STOPWORDS)."""
    from ape_dts_ray.functions.text import STOPWORDS

    # escape single quotes like cdc_sql_format does: elided French forms
    # ("d'", "l'") are the natural next additions and would break the SQL
    rows = [f"""('{lang}', '{w.replace("'", "''")}')"""
            for lang in sorted(STOPWORDS) for w in sorted(STOPWORDS[lang])]
    return ", ".join(rows)


# must equal LangId.word_re (functions/text.py) — applied to lower() text
_LANGID_WORD_RE = "[a-zäöüßáéíóúñàâçèêîôû]+"


def _q_epoch_size() -> int:
    """The driver queries' lake epoch size — imported lazily so the oracle
    SQL's epoch derivation is interpolated from the SAME constant the
    engine-side lakes are created with (lockstep by construction)."""
    from ape_dts_ray.pipelines.queries import QUERY_EPOCH_SIZE

    return QUERY_EPOCH_SIZE


def _with_epoch_size(sql: str) -> str:
    """Substitute the __EPOCH_SIZE__ sentinel; refuse SQL that lost it (an
    un-substituted sentinel would also die loudly as a DuckDB syntax error,
    but failing here names the actual mistake)."""
    if "__EPOCH_SIZE__" not in sql:
        raise AssertionError(
            "cdc_lineage_totals SQL lost its __EPOCH_SIZE__ sentinel — the "
            "oracle would silently desynchronize from QUERY_EPOCH_SIZE")
    return sql.replace("__EPOCH_SIZE__", str(_q_epoch_size()))


def _fingerprint_window_sql(window: int = 16) -> str:
    """The per-window Rabin-Karp hash as a SQL expression over an ASCII text
    column (the sf corpus is pure ASCII, so char position == byte position).
    Powers come from the SAME constants as functions/text.py::rolling_hashes."""
    from ape_dts_ray.functions.text import BASE, MOD

    pows = [1] * window
    for i in range(1, window):
        pows[i] = (pows[i - 1] * int(BASE)) % int(MOD)
    terms = " + ".join(
        f"ascii(substr(text, i + {j}, 1))::BIGINT * {pows[window - 1 - j]}"
        for j in range(window))
    return f"({terms}) % {int(MOD)}"

_LAST = """
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY log_offset DESC) AS rn
  FROM changes
)
"""


def entry() -> Any:
    """Flagship: full CDC replay of the sf0.001 change stream → live state."""
    from ape_dts_ray.pipelines import queries as q

    return q.cdc_apply_lww("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ape_dts_ray.pipelines import queries as q

    return {
        "cdc_apply_lww": q.cdc_apply_lww,
        "cdc_follow": q.cdc_follow,
        "cdc_follow_mixed": q.cdc_follow_mixed,
        "cdc_merge_batch": q.cdc_merge_batch,
        "cdc_filter_events": q.cdc_filter_events,
        "cdc_route_rename": q.cdc_route_rename,
        "cdc_lineage_per_conv": q.cdc_lineage_per_conv,
        "cdc_snapshot_read": q.cdc_snapshot_read,
        "cdc_snapshot_load": q.cdc_snapshot_load,
        "cdc_snapshot_sample": q.cdc_snapshot_sample,
        "cdc_checker": q.cdc_checker,
        "cdc_schema_evolution": q.cdc_schema_evolution,
        "cdc_schema_nonadditive": q.cdc_schema_nonadditive,
        "cdc_ddl_text": q.cdc_ddl_text,
        "cdc_multitable": q.cdc_multitable,
        "cdc_two_way": q.cdc_two_way,
        "cdc_time_window": q.cdc_time_window,
        "cdc_lineage_totals": q.cdc_lineage_totals,
        "cdc_pk_change": q.cdc_pk_change,
        "cdc_sql_format": q.cdc_sql_format,
        "cdc_dcl": q.cdc_dcl,
        "cdc_rbac_state": q.cdc_rbac_state,
        "cdc_mongo_doc": q.cdc_mongo_doc,
        "cdc_avro_transport": q.cdc_avro_transport,
        "cdc_wide_types": q.cdc_wide_types,
        "redis_replay": q.redis_replay,
        "redis_incremental": q.redis_incremental,
        "redis_snapshot": q.redis_snapshot,
        "redis_bigkeys": q.redis_bigkeys,
        "redis_hotkeys": q.redis_hotkeys,
        "dedup_exact": q.dedup_exact,
        "dedup_minhash": q.dedup_minhash,
        "dedup_simhash": q.dedup_simhash,
        "dedup_embedding": q.dedup_embedding,
        "ann_topk": q.ann_topk,
        "ann_ivf": q.ann_ivf,
        "text_stats": q.text_stats,
        "text_quality_counts": q.text_quality_counts,
        "text_langid": q.text_langid,
        "doc_fingerprint": q.doc_fingerprint,
    }


_REDIS_FOLD_SQL = """
    WITH swin AS (
      SELECT 'ev:' || (event_id % 997) AS key,
             max_by(CASE WHEN event_type = 'error' THEN NULL
                         ELSE 'v:' || event_id || ':' || props END,
                    event_id) AS value,
             max_by(event_type, event_id) AS last_et
      FROM events WHERE event_type IN ('click', 'view', 'error')
      GROUP BY 1
    ),
    hw AS (
      SELECT 'conv:' || user_id AS key, 'f' || (event_id % 40) AS field,
             max_by(props, event_id) AS value
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    ),
    zw AS (
      SELECT 'zrank:' || (user_id % 13) AS key, 'm' || user_id AS field,
             max_by(value, event_id) AS score
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT key, CAST(NULL AS VARCHAR) AS field, value,
           CAST(NULL AS DOUBLE) AS score
    FROM swin WHERE last_et <> 'error'
    UNION ALL
    SELECT key, field, value, CAST(NULL AS DOUBLE) AS score FROM hw
    UNION ALL
    SELECT key, field, CAST(NULL AS VARCHAR) AS value, score FROM zw
"""


def oracle_sql() -> dict[str, str]:
    # one interleaved stream split per table (conv parity); winners per
    # table — conv_id determines the table, so ranking per key suffices.
    # SHARED by cdc_multitable (one-shot fan-out) and cdc_follow_mixed (the
    # daemon drain of the same stream): one definition, two gates.
    multitable_sql = CHANGES_CTE + """,
            aug AS (
              SELECT *, CASE WHEN CAST(substr(conv_id, 6) AS BIGINT) % 2 = 0
                             THEN 'tbl_even' ELSE 'tbl_odd' END AS tbl
              FROM changes
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY log_offset DESC) AS rn
              FROM aug
            )
            SELECT conv_id, turn_idx, role, text, tool, ts, tbl
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """
    return {
        "cdc_apply_lww": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # continuous tail mode drains the identical stream in two growing-log
        # waves — the daemon's final state must equal the one-shot replay's
        "cdc_follow": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        "cdc_merge_batch": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, turn_idx, op AS last_op, log_offset AS last_offset
            FROM ranked WHERE rn = 1
        """,
        "cdc_filter_events": CHANGES_CTE + """
            SELECT log_offset, op, conv_id, turn_idx, text
            FROM changes
            WHERE op IN ('insert', 'update') AND tool = 'search'
        """,
        "cdc_route_rename": CHANGES_CTE + """
            SELECT log_offset, conv_id AS conversation_id, turn_idx,
                   text AS content
            FROM changes
        """,
        "cdc_lineage_per_conv": CHANGES_CTE + """
            SELECT conv_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN op <> 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_upserts,
                   CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
                   MIN(log_offset) AS offset_min,
                   MAX(log_offset) AS offset_max
            FROM changes GROUP BY conv_id
        """,
        "cdc_snapshot_read": """
            SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 200
        """,
        "cdc_pk_change": CHANGES_CTE + """,
            aug AS (
              SELECT *, CASE WHEN op = 'update' AND role = 'view'
                             THEN turn_idx + 40 END AS new_turn_idx
              FROM changes
            ),
            split AS (
              SELECT log_offset, 0 AS seq, op, conv_id, turn_idx,
                     role, text, tool, ts
              FROM aug WHERE new_turn_idx IS NULL
              UNION ALL
              SELECT log_offset, 0, 'delete', conv_id, turn_idx,
                     NULL, NULL, NULL, NULL
              FROM aug WHERE new_turn_idx IS NOT NULL
              UNION ALL
              SELECT log_offset, 1, 'insert', conv_id,
                     CAST(new_turn_idx AS INTEGER),
                     role, text, tool, ts
              FROM aug WHERE new_turn_idx IS NOT NULL
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx
                ORDER BY log_offset DESC, seq DESC) AS rn
              FROM split
            )
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # epoch id = log_offset // QUERY_EPOCH_SIZE must mirror the engine's
        # epoch_size — the __EPOCH_SIZE__ sentinel is substituted from
        # pipelines/queries.py's constant by _with_epoch_size, which RAISES
        # if the sentinel is missing (a bare literal .replace would silently
        # no-op the moment someone edited the SQL — the exact no-signal
        # drift this lockstep exists to prevent); per-key-per-epoch last-op
        # counts are partition-independent because a key's events never
        # split across partitions
        "cdc_lineage_totals": _with_epoch_size(CHANGES_CTE + """,
            per_epoch AS (
              -- // is floor division: CAST over / would ROUND and split
              -- keys mid-epoch (caught by the sf0.1 sweep)
              SELECT *, log_offset // __EPOCH_SIZE__ AS ep,
                     row_number() OVER (
                       PARTITION BY conv_id, turn_idx,
                                    log_offset // __EPOCH_SIZE__
                       ORDER BY log_offset DESC) AS rn
              FROM changes
            )
            SELECT
              (SELECT COUNT(*) FROM changes) AS n_events,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN op <> 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_upserts,
              CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
              (SELECT MIN(log_offset) FROM changes) AS offset_min,
              (SELECT MAX(log_offset) FROM changes) AS offset_max
            FROM per_epoch WHERE rn = 1
        """),
        "cdc_snapshot_sample": """
            SELECT doc_id, n_chars FROM documents WHERE doc_id % 7 = 0
        """,
        "cdc_snapshot_load": CHANGES_CTE + """,
            ins_ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY log_offset DESC) AS rn
              FROM changes WHERE op = 'insert'
            )
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ins_ranked WHERE rn = 1
        """,
        "cdc_time_window": CHANGES_CTE + """
            SELECT log_offset, conv_id, turn_idx, ts
            FROM changes
            WHERE op IN ('insert', 'update')
              AND ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        """,
        "cdc_checker": CHANGES_CTE + "," + _LAST + """,
            src AS (
              SELECT conv_id, turn_idx, role, text, tool, ts
              FROM ranked WHERE rn = 1 AND op <> 'delete'
            ),
            ins_ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY log_offset DESC) AS rn
              FROM changes WHERE op = 'insert'
            ),
            dst AS (
              SELECT conv_id, turn_idx, role, text, tool, ts
              FROM ins_ranked WHERE rn = 1
            ),
            j AS (
              SELECT
                COALESCE(s.conv_id, d.conv_id) AS conv_id,
                COALESCE(s.turn_idx, d.turn_idx) AS turn_idx,
                CASE
                  WHEN d.conv_id IS NULL THEN 'miss'
                  WHEN s.conv_id IS NULL THEN 'extra'
                  WHEN s.role IS DISTINCT FROM d.role
                    OR s.text IS DISTINCT FROM d.text
                    OR s.tool IS DISTINCT FROM d.tool
                    OR s.ts   IS DISTINCT FROM d.ts THEN 'diff'
                END AS check_type
              FROM src s FULL OUTER JOIN dst d
                ON s.conv_id = d.conv_id AND s.turn_idx = d.turn_idx
            )
            SELECT conv_id, turn_idx, check_type
            FROM j WHERE check_type IS NOT NULL
        """,
        "cdc_schema_evolution": CHANGES_CTE + """,
            aug AS (
              SELECT *, CASE
                WHEN log_offset >= (SELECT COUNT(*) // 2 FROM events)
                     AND op <> 'delete'
                THEN CASE WHEN tool = 'search' THEN 'web' ELSE 'chat' END
              END AS channel
              FROM changes
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY log_offset DESC) AS rn
              FROM aug
            )
            SELECT conv_id, turn_idx, role, text, tool, ts, channel
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # mixed-stream daemon drain == one-shot fan-out: the same shared SQL
        "cdc_follow_mixed": multitable_sql,
        "cdc_multitable": multitable_sql,
        # rename tool->tool_name + drop role + widen turn_idx: the final
        # state is the plain LWW winners with the mapped target schema
        "cdc_schema_nonadditive": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text,
                   tool AS tool_name, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # DDL-TEXT-driven schema evolution lands the exact same state as the
        # structured-ops query — one oracle, two engine entry points
        "cdc_ddl_text": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text,
                   tool AS tool_name, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # two-way replication converges both lakes to the global LWW fold —
        # the query asserts A == B and returns A, so the oracle is
        # cdc_apply_lww's
        "cdc_two_way": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # Wide-type LWW winners (decimal/binary/enum/json payload) with the
        # target-side schema ops applied: payload_bin→payload rename, qty
        # widened to BIGINT, note dropped — derivation in lockstep with
        # sources/derive.py::derive_wide_changes (WIDE_CTE)
        "cdc_wide_types": WIDE_CTE + """,
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY log_offset DESC) AS rn
              FROM wide
            )
            SELECT conv_id, turn_idx,
                   CAST(amount AS VARCHAR) AS amount,
                   decode(payload_bin) AS payload, tier,
                   meta_json, CAST(qty AS BIGINT) AS qty
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # Redis replication fold — derivation in lockstep with
        # queries._redis_cmds_batch (strings are key-level LWW incl. DEL
        # tombstones; hash fields and zset members are field-level LWW).
        # redis_incremental converges to the same keyspace through the
        # watermark-advancing RedisKeyspaceStore, so it shares the oracle.
        "redis_replay": _REDIS_FOLD_SQL,
        "redis_incremental": _REDIS_FOLD_SQL,
        # RDB binary roundtrip: the parse side must reproduce the documents
        # exactly (text through raw/LZF string encodings, n_chars through the
        # RDB integer encodings)
        "redis_snapshot": """
            SELECT 'doc:' || doc_id AS key, text AS value FROM documents
            UNION ALL
            SELECT 'len:' || doc_id AS key, CAST(n_chars AS VARCHAR) AS value
            FROM documents
        """,
        # Big-key statistic: data_size = key bytes + Σ(field+value bytes)
        # per key (get_data_malloc_size analog) over the doc-string +
        # hash-bucket keyspace redis_bigkeys encodes through real RDB;
        # threshold + top-40 under the (size desc, key asc) total order —
        # unique keys make the LIMIT boundary deterministic on both sides
        "redis_bigkeys": """
            WITH sizes AS (
              SELECT CAST(0 AS BIGINT) AS db_id, 'string' AS key_type,
                     'doc:' || CAST(doc_id AS VARCHAR) AS key,
                     CAST(length('doc:' || CAST(doc_id AS VARCHAR))
                          + length(text) AS BIGINT) AS data_size
              FROM documents
              UNION ALL
              SELECT CAST(0 AS BIGINT), 'hash',
                     'bucket:' || CAST(b AS VARCHAR),
                     CAST(length('bucket:' || CAST(b AS VARCHAR))
                          + SUM(length('d' || CAST(doc_id AS VARCHAR))
                                + length(text)) AS BIGINT)
              FROM (SELECT doc_id % 29 AS b, doc_id, text FROM documents)
              GROUP BY b
            )
            SELECT db_id, key_type, key, data_size FROM sizes
            WHERE data_size >= 420
            ORDER BY data_size DESC, key
            LIMIT 40
        """,
        # Hot-key statistic: freq = (doc_id·7) % 256 rides the RDB LFU
        # prefix through encode → parse; threshold keeps the hottest set
        "redis_hotkeys": """
            SELECT CAST(0 AS BIGINT) AS db_id,
                   'doc:' || CAST(doc_id AS VARCHAR) AS key,
                   CAST((doc_id * 7) % 256 AS BIGINT) AS freq
            FROM documents
            WHERE (doc_id * 7) % 256 >= 200
        """,
        "dedup_exact": """
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
              FROM documents
            ) WHERE rn = 1
        """,
        "text_stats": """
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS text_len
            FROM documents
        """,
        "text_quality_counts": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS text_len,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
                   CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper
            FROM documents
        """,
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings WHERE vec_id < 5
            ),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS c
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_id, vec_id, row_number() OVER (
                PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
              FROM sims
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 10
        """,
        # SqlSinker string assembly, mirrored from stages/sql_format.py
        # (REPLACE upsert / keyed DELETE, '' escaping, NULL for null payloads)
        "cdc_sql_format": CHANGES_CTE + """
            SELECT log_offset,
              CASE WHEN op = 'delete'
                THEN 'DELETE FROM transcripts WHERE conv_id = '''
                     || replace(conv_id, '''', '''''')
                     || ''' AND turn_idx = ' || CAST(turn_idx AS VARCHAR) || ';'
                ELSE 'REPLACE INTO transcripts (conv_id, turn_idx, role, text, tool) VALUES ('''
                     || replace(conv_id, '''', '''''') || ''', '
                     || CAST(turn_idx AS VARCHAR) || ', '
                     || COALESCE('''' || replace(role, '''', '''''') || '''', 'NULL') || ', '
                     || COALESCE('''' || replace(text, '''', '''''') || '''', 'NULL') || ', '
                     || COALESCE('''' || replace(tool, '''', '''''') || '''', 'NULL') || ');'
              END AS "sql"
            FROM changes
        """,
        # Mongo-shaped oplog replay: per-_id LWW winners (mongo_merger.rs
        # fold), docs derived in lockstep with derive_mongo_changes
        "cdc_mongo_doc": MONGO_CTE + """,
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY _id ORDER BY log_offset DESC) AS rn
              FROM mongo
            )
            SELECT _id, doc FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # Avro transport must be lossless: state after encode→decode→replay
        # equals the direct replay's oracle
        "cdc_avro_transport": CHANGES_CTE + "," + _LAST + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ranked WHERE rn = 1 AND op <> 'delete'
        """,
        # DCL statement log: classification ground truth comes from the
        # template id (DCL_CTE, lockstep with derive_dcl_statements — the
        # engine classifies from TEXT, the oracle declares by construction);
        # DML rows carry NULL dcl_type, excluded by IN like the engine's
        # dcl_simple_judgment rejection
        "cdc_dcl": DCL_CTE + """
            SELECT log_offset, dcl_type, statement
            FROM dcl
            WHERE dcl_type IN ('create_user', 'drop_user', 'grant', 'revoke')
        """,
        # RBAC state fold (stages/rbac.py): the engine parses the statement
        # TEXT; the oracle declares each event by template construction —
        # the event selection and template id come from DCL_CTE itself
        # (dcl.k / dcl.uid), rx only adds the per-template STRUCTURED facts
        # (hosts/objects/privileges, lockstep-noted in derive.py) — then
        # folds with windows: last create/drop decides survival, last
        # create/alter carries the password, DROP USER wipes older grants
        # and default-role bindings (g.log_offset > last_drop), grants fold
        # per (user, host, object, privilege) after the multi-privilege
        # GRANT template explodes via unnest
        "cdc_rbac_state": DCL_CTE + """,
            rx AS (
              SELECT log_offset, 'user' AS kind,
                     CASE k WHEN 2 THEN 'alter' WHEN 3 THEN 'drop'
                            ELSE 'create' END AS action,
                     'u' || CAST(uid AS VARCHAR) AS user_name,
                     CASE WHEN k IN (1, 3) THEN '%' ELSE 'localhost' END AS host,
                     '' AS role_name, '' AS grant_object, '' AS privilege,
                     false AS with_grant,
                     CASE WHEN k IN (0, 1, 2)
                          THEN 'pw' || CAST(log_offset AS VARCHAR)
                          ELSE '' END AS password
              FROM dcl WHERE k IN (0, 1, 2, 3)
              UNION ALL
              SELECT log_offset, 'role',
                     CASE k WHEN 4 THEN 'create' ELSE 'drop' END,
                     '', '', 'r' || CAST(uid % 50 AS VARCHAR), '', '', false, ''
              FROM dcl WHERE k IN (4, 5)
              UNION ALL
              SELECT log_offset, 'grant', 'grant',
                     'u' || CAST(uid AS VARCHAR), '%', '',
                     'db' || CAST(uid % 10 AS VARCHAR) || '.tb1',
                     unnest(['SELECT', 'INSERT']), false, ''
              FROM dcl WHERE k = 6
              UNION ALL
              SELECT log_offset, 'grant', 'grant',
                     'u' || CAST(uid AS VARCHAR), 'localhost', '', '*.*',
                     'ALL', true, ''
              FROM dcl WHERE k = 7
              UNION ALL
              SELECT log_offset, 'grant', 'revoke',
                     'u' || CAST(uid AS VARCHAR), '%', '',
                     'db' || CAST(uid % 10 AS VARCHAR) || '.tb1', 'SELECT',
                     false, ''
              FROM dcl WHERE k = 8
              UNION ALL
              SELECT log_offset, 'default_role', 'set',
                     'u' || CAST(uid AS VARCHAR), '%',
                     'r' || CAST(uid % 50 AS VARCHAR), '', '', false, ''
              FROM dcl WHERE k = 9
            ), ucd AS (
              SELECT user_name, host, action, log_offset,
                     row_number() OVER (PARTITION BY user_name, host
                                        ORDER BY log_offset DESC) AS rn
              FROM rx WHERE kind = 'user' AND action IN ('create', 'drop')
            ), usurv AS (
              SELECT user_name, host FROM ucd WHERE rn = 1 AND action = 'create'
            ), udrop AS (
              SELECT user_name, host, max(log_offset) AS last_drop
              FROM rx WHERE kind = 'user' AND action = 'drop' GROUP BY 1, 2
            ), upw AS (
              SELECT user_name, host, password, log_offset,
                     row_number() OVER (PARTITION BY user_name, host
                                        ORDER BY log_offset DESC) AS rn
              FROM rx WHERE kind = 'user' AND action IN ('create', 'alter')
            ), users AS (
              SELECT 'user' AS kind, p.user_name, p.host, '' AS role_name,
                     '' AS grant_object, '' AS privilege, false AS with_grant,
                     p.password, p.log_offset
              FROM upw p JOIN usurv u USING (user_name, host) WHERE p.rn = 1
            ), rlast AS (
              SELECT role_name, action, log_offset,
                     row_number() OVER (PARTITION BY role_name
                                        ORDER BY log_offset DESC) AS rn
              FROM rx WHERE kind = 'role'
            ), roles AS (
              SELECT 'role' AS kind, '' AS user_name, '' AS host, role_name,
                     '' AS grant_object, '' AS privilege, false AS with_grant,
                     '' AS password, log_offset
              FROM rlast WHERE rn = 1 AND action = 'create'
            ), glast AS (
              SELECT user_name, host, grant_object, privilege, action,
                     with_grant, log_offset,
                     row_number() OVER (PARTITION BY user_name, host,
                                        grant_object, privilege
                                        ORDER BY log_offset DESC) AS rn
              FROM rx WHERE kind = 'grant'
            ), grants AS (
              SELECT 'grant' AS kind, g.user_name, g.host, '' AS role_name,
                     g.grant_object, g.privilege, g.with_grant,
                     '' AS password, g.log_offset
              FROM glast g
              JOIN usurv u USING (user_name, host)
              LEFT JOIN udrop d USING (user_name, host)
              WHERE g.rn = 1 AND g.action = 'grant'
                AND g.log_offset > coalesce(d.last_drop, -1)
            ), slast AS (
              SELECT user_name, host, role_name, log_offset,
                     row_number() OVER (PARTITION BY user_name, host
                                        ORDER BY log_offset DESC) AS rn
              FROM rx WHERE kind = 'default_role'
            ), defaults AS (
              SELECT 'default_role' AS kind, s.user_name, s.host, s.role_name,
                     '' AS grant_object, '' AS privilege, false AS with_grant,
                     '' AS password, s.log_offset
              FROM slast s
              JOIN usurv u USING (user_name, host)
              LEFT JOIN udrop d USING (user_name, host)
              WHERE s.rn = 1 AND s.log_offset > coalesce(d.last_drop, -1)
            )
            SELECT * FROM users UNION ALL SELECT * FROM roles
            UNION ALL SELECT * FROM grants UNION ALL SELECT * FROM defaults
        """,
        # Stopword-vote language id, mirrored from functions/text.py::LangId
        # (count stopword OCCURRENCES per language; winner = max count with
        # lang-code-ascending tie-break; 'und' when no stopword hits)
        "text_langid": f"""
            WITH words AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '{_LANGID_WORD_RE}')) AS w
              FROM documents
            ),
            sw(lang, w) AS (VALUES {_stopword_values()}),
            cnt AS (
              SELECT doc_id, lang, count(*) AS n
              FROM words JOIN sw USING (w) GROUP BY 1, 2
            ),
            best AS (
              SELECT doc_id, lang, row_number() OVER (
                PARTITION BY doc_id ORDER BY n DESC, lang) AS rn
              FROM cnt WHERE n > 0
            )
            SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
            FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
        """,
        # Exact all-pairs cosine near-dup (CAST to DOUBLE[] so both sides
        # compute in float64; τ=0.3 sits in smooth density — no boundary mass)
        "dedup_embedding": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        """,
        # True-Jaccard near-dup pairs over 5-word shingle SETS — the exact
        # semantics the MinHash pipeline approximates; banding recall ≈ 1 on
        # this corpus (all dup pairs J ≥ 0.87), so LSH+verify equals exact.
        # Shingle rule mirrors functions/dedup.py::_shingles (k=5, whole text
        # when fewer than 5 words; Jaccard over unique shingles).
        "dedup_minhash": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN len(ws) < 5 THEN list_value(array_to_string(ws, ' '))
                          ELSE list_transform(range(1, len(ws) - 3),
                                 i -> array_to_string(list_slice(ws, i, i + 4), ' '))
                     END AS sets FROM w),
            u AS (SELECT DISTINCT doc_id, unnest(sets) AS sg FROM sh),
            cnt AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1),
            inter AS (SELECT x.doc_id AS ia, y.doc_id AS ib, count(*) AS i
                      FROM u x JOIN u y USING (sg)
                      WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
            SELECT ia AS a, ib AS b
            FROM inter
            JOIN cnt ca ON ca.doc_id = ia
            JOIN cnt cb ON cb.doc_id = ib
            WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.6
        """,
        # SimHash signature recomputed in SQL (md5-derived 64-bit word hash,
        # per-bit majority vote over word OCCURRENCES — mirrors
        # functions/dedup.py::simhash64) → all-pairs Hamming ≤ 3 via
        # bit_count(xor) on the two 32-bit signature halves.
        "dedup_simhash": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
            ),
            wh AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS h
              FROM words
            ),
            bits AS (
              SELECT doc_id, b,
                     sum(CAST((h >> b) & 1 AS BIGINT)) AS ones, count(*) AS n
              FROM wh CROSS JOIN (SELECT unnest(range(64)) AS b)
              GROUP BY 1, 2
            ),
            sbit AS (
              SELECT doc_id, b,
                     CASE WHEN ones * 2 > n THEN 1 ELSE 0 END AS bit
              FROM bits
            ),
            sig AS (
              SELECT doc_id,
                sum(CASE WHEN b < 32 THEN bit * (1::BIGINT << b) ELSE 0 END) AS lo,
                sum(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (b - 32)) ELSE 0 END) AS hi
              FROM sbit GROUP BY 1
            ),
            ham AS (
              SELECT x.doc_id AS a, y.doc_id AS b,
                     CAST(bit_count(xor(x.lo, y.lo))
                        + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming
              FROM sig x JOIN sig y ON x.doc_id < y.doc_id
            )
            SELECT a, b, hamming FROM ham WHERE hamming <= 3
        """,
        # Winnowing fingerprint recomputed in SQL: every 16-byte Rabin-Karp
        # window hash (ASCII ⇒ ascii(substr) == byte), min + 016x digest of
        # the 8 smallest — mirrors functions/text.py::Fingerprint.
        "doc_fingerprint": f"""
            WITH docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
            win AS (
              SELECT doc_id, text, unnest(range(1, n - 14)) AS i
              FROM docs WHERE n >= 16
            ),
            h AS (SELECT doc_id, {_fingerprint_window_sql()} AS hv FROM win),
            ranked AS (
              SELECT doc_id, hv, row_number() OVER (
                PARTITION BY doc_id ORDER BY hv) AS rn
              FROM h
            ),
            agg AS (
              SELECT doc_id, min(hv) AS mh, sum(hv) AS s
              FROM ranked WHERE rn <= 8 GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(a.mh, 0) AS min_hash,
                   COALESCE(printf('%016x', a.s::BIGINT), '0000000000000000') AS fingerprint
            FROM docs d LEFT JOIN agg a USING (doc_id)
        """,
        # ann_ivf: approximate by construction (recall < 1) → rows-only check,
        # with recall@k measured against the exact ann_topk in the pipeline.
    }
