"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship CDC replay on a deterministic synthetic changelog
(sf0.001 scale). ``queries()`` — one callable per implemented operator
family from SURVEY.md §2 plus the training-data extensions; each takes an
``sf_dir`` and returns a Dataset / DataFrame / Arrow table. ``oracle_sql``
— DuckDB-equivalent SQL for every SQL-expressible query (same column
names; float aggregates rounded identically on both sides).

Ray is initialised by the driver BEFORE importing this module: nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

#: deterministic changelog cache shared between the Ray queries and the
#: DuckDB oracle (the oracle reads the same parquet via read_parquet()).
CDC_CACHE_ROOT = "/tmp/etl_cdc_cache"

_CDC_SIZES = {  # events, conversations — scaled per sf tier
    "sf0.001": (20_000, 400),
    "sf0.01": (80_000, 1_600),
    "sf0.1": (400_000, 8_000),
}
_CDC_SEED = 42


def _sf_name(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return name if name in _CDC_SIZES else "sf0.01"


def _changelog_dir(sf_name: str) -> str:
    return os.path.join(CDC_CACHE_ROOT, sf_name, "changelog")


def _ensure_changelog(sf_name: str) -> str:
    """Write the deterministic changelog for one sf tier (idempotent)."""
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    d = _changelog_dir(sf_name)
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    n_events, n_convs = _CDC_SIZES[sf_name]
    log = generate_changelog(
        GenConfig(
            num_events=n_events,
            num_conversations=n_convs,
            seed=_CDC_SEED,
            hot_key_frac=0.1,
            out_of_order=True,
        )
    )
    ChangeLog(d).write_segments(log, segment_rows=max(10_000, n_events // 8))
    with open(done, "w") as f:
        f.write("ok")
    return d


def _ensure_patch_changelog(sf_name: str) -> str:
    """Deterministic changelog variant with PARTIAL row images (op="P",
    25% of updates carry only the changed columns) — the cdc_patch_replay
    fixture (idempotent)."""
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    d = os.path.join(CDC_CACHE_ROOT, sf_name, "changelog_patch")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    n_events, n_convs = _CDC_SIZES[sf_name]
    log = generate_changelog(
        GenConfig(
            num_events=n_events,
            num_conversations=n_convs,
            seed=_CDC_SEED,
            hot_key_frac=0.1,
            out_of_order=True,
            patch_frac=0.25,
        )
    )
    ChangeLog(d).write_segments(log, segment_rows=max(10_000, n_events // 8))
    with open(done, "w") as f:
        f.write("ok")
    return d


def _cdc_patch_replay(sf_dir: str):
    """Partial-row-image replay: 25% of updates are Debezium/Mongo-style
    patches (only changed columns set, NULL = unchanged) resolved against
    prior state at apply time (pipelines/cdc._fold_epoch_patches); the
    committed snapshot must equal the global (ts, lsn)-ordered fold."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_patch_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_patch_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return eng.snapshot().map_batches(narrow, batch_format="pyarrow")


def _cdc_version_diff(sf_dir: str):
    """Row-level diff between two committed versions (CDCEngine.diff):
    replay the deterministic changelog (4 epochs → versions 2..5), then
    diff version 3 (after the 2nd epoch, LSN watermark = n/2) against the
    final state — I/U/D per key from a per-partition LWW compare."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_diff_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2, vacuum=False)

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return eng.diff(3).map_batches(narrow, batch_format="pyarrow")


def _cdc_predicate_dml(sf_dir: str):
    """Predicate DML over the replayed lake (LakeWriter.delete_where /
    update_where): DELETE WHERE role='tool', then UPDATE WHERE role='user'
    SET tool='flagged', text = text || '!'. Both run as self-sourced
    change capture (snapshot scan → tombstones / op='P' patches through
    ordinary exactly-once epochs); the committed snapshot must equal the
    SQL DELETE+UPDATE applied to the LWW-replayed state."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.writer import LakeWriter
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_dml_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    w = LakeWriter.from_engine(eng)
    w.delete_where([("role", "==", "tool")])
    bang = pa.scalar("!", pa.large_string())
    empty = pa.scalar("", pa.large_string())
    w.update_where(
        [("role", "==", "user")],
        {
            "tool": "flagged",
            "text": lambda b: pc.binary_join_element_wise(
                b.column("text"), bang, empty
            ),
        },
    )

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return eng.snapshot().map_batches(narrow, batch_format="pyarrow")


def _cdc_predicate_dml_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), state AS (
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT conv_id, turn_idx, role,
               CASE WHEN role = 'user' THEN text || '!' ELSE text END AS text,
               CASE WHEN role = 'user' THEN 'flagged' ELSE tool END AS tool,
               ts
        FROM state WHERE role <> 'tool'
    """


def _cdc_purge(sf_dir: str):
    """Right-to-be-forgotten hard delete (CDCEngine.purge): replay the
    changelog, then purge every conversation whose id ends in '7' —
    physically rewriting the touched files and vacuuming superseded
    versions. The committed snapshot must equal the LWW final state with
    those conversations absent (the oracle applies the same predicate);
    the purge path itself (file rewrite + manifest/registry/salt-map
    scrub + physical-erasure audit) is covered by tests/test_purge.py."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_purge_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    victims: set = set()
    for b in eng.snapshot(columns=["conv_id"]).iter_batches(batch_format="pyarrow"):
        col = b.column("conv_id")
        victims.update(
            pc.unique(col.filter(pc.ends_with(col, pattern="7"))).to_pylist()
        )
    eng.purge(sorted(victims))

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return eng.snapshot().map_batches(narrow, batch_format="pyarrow")


def _cdc_purge_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D' AND conv_id NOT LIKE '%7'
    """


def _cdc_replay(sf_dir: str):
    """Flagship: replay the changelog into a fresh lake table, return the
    committed snapshot (public columns, utf8 for cross-engine compare)."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return eng.snapshot().map_batches(narrow, batch_format="pyarrow")


#: zone-map pushdown predicate for cdc_snapshot_pruned — the PK-range
#: conjuncts may prune files inside the merge-on-read stack, the role
#: conjunct is residual-only (value columns prune whole partitions at
#: most; see state/zonemap module doc)
_PRUNE_PREDICATE = [
    ("conv_id", ">=", "conv-000010"),
    ("conv_id", "<", "conv-000200"),
    ("role", "==", "user"),
]


def _cdc_snapshot_pruned(sf_dir: str):
    """Predicate-pushdown snapshot: replay the changelog, then read with
    a zone-map predicate (state/zonemap). ``role`` is filtered but NOT
    projected, exercising the predicate-column retention path in
    CDCEngine.snapshot; the PK range exercises file-level pruning."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_prune_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    ds = eng.snapshot(
        columns=["conv_id", "turn_idx", "text", "ts"], predicate=_PRUNE_PREDICATE
    )

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return ds.map_batches(narrow, batch_format="pyarrow")


def _scd2_history_table(sf: str):
    """Replay the deterministic changelog into a fresh SCD2 history table
    (pipelines/history.py — every change event becomes an interval row)."""
    import tempfile

    from etl_framework_ray.pipelines.history import HistoryTable
    from etl_framework_ray.sources.changelog import ChangeLog

    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_hist_{sf}_")
    h = HistoryTable(os.path.join(lake, "transcripts_history"), num_partitions=32)
    h.replay(clog, segments_per_epoch=2)
    return h


def _narrow_text(ds):
    import pyarrow as pa

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return ds.map_batches(narrow, batch_format="pyarrow")


def _cdc_scd2_history(sf_dir: str):
    """SCD Type-2: the full version timeline of the CDC feed — one row per
    change event with (valid_from, valid_to, is_current) derived by the
    partition-local lead pass. Oracle: LEAD() window over the raw log."""
    return _narrow_text(_scd2_history_table(_sf_name(sf_dir)).read())


def _scd2_cutoff_ts(sf: str):
    """Deterministic event-time cutoff shared with the SQL oracle: the max
    ts among the first half of the log's LSNs."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etl_framework_ray.sources.changelog import ChangeLog

    k = _CDC_SIZES[sf][0] // 2
    cut = None
    for seg in ChangeLog(_ensure_changelog(sf)).segments():
        if seg.min_lsn > k:
            continue
        t = pq.read_table(seg.path, columns=["lsn", "ts"])
        t = t.filter(pc.less_equal(t.column("lsn"), k))
        if t.num_rows:
            m = pc.max(t.column("ts")).as_py()
            cut = m if cut is None or m > cut else cut
    return cut


def _cdc_scd2_asof(sf_dir: str):
    """Event-time time travel through the history table: the base table's
    live rows as of the mid-log event time — per key, the last version
    whose validity interval covers the cutoff, deletes excluded."""
    sf = _sf_name(sf_dir)
    h = _scd2_history_table(sf)
    return _narrow_text(h.snapshot_asof(_scd2_cutoff_ts(sf)))


def _cdc_rollup(sf_dir: str):
    """Gold rollup over the committed CDC snapshot (per-conversation)."""
    import tempfile

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.publish import conversation_rollup
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_roll_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    return conversation_rollup(eng.snapshot())


def _cdc_role_rollup_sets(sf_dir: str):
    """CDC × GROUPING SETS composition: replay the changelog, then one
    grouping_sets pass over the committed snapshot gives per-role counts
    AND the grand total with SQL GROUPING() parity (stages/rollup.py over
    CDCEngine.snapshot — raw turns pre-aggregate per block; only
    replicated partials shuffle)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.stages.rollup import grouping_sets, rollup_sets

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_rsets_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)

    def widen(t: pa.Table) -> pa.Table:
        chars = pc.utf8_length(pc.fill_null(t.column("text"), ""))
        return pa.table(
            {"role": t.column("role"), "chars": chars.cast(pa.int64())}
        )

    snap = eng.snapshot(columns=["role", "text"]).map_batches(
        widen, batch_format="pyarrow"
    )
    return grouping_sets(
        snap,
        rollup_sets(["role"]),
        {"n_turns": ("count", None), "total_chars": ("sum", "chars")},
    )


def _cdc_changefeed(sf_dir: str):
    """Streaming changefeed: replay the seeded log, then read the net
    changes since the mid-stream watermark as a Dataset (one merge task
    per partition — cdc.py:changefeed). Retention keeps folded deltas
    readable; tombstones surface as ``deleted``."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    n_events = _CDC_SIZES[sf][0]
    watermark = n_events // 2  # a segment boundary in every tier (lsn0=1)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_feed_{sf}_")
    eng = CDCEngine(
        os.path.join(lake, "transcripts"),
        num_partitions=32,
        changefeed_retention_lsn=n_events,  # cover the whole window
    )
    eng.replay(clog, segments_per_epoch=1)
    feed = eng.changefeed(since_lsn=watermark)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "text": batch.column("text").cast(pa.string()),
                "ts": batch.column("ts"),
                "deleted": batch.column("_deleted"),
            }
        )

    return feed.map_batches(project, batch_format="pyarrow")


def _half_log_ivm(
    sf_dir: str,
    view_cls_name: str | tuple[str, ...],
    prefix: str,
    result: str = "read",
    view_kwargs: dict | None = None,
):
    """Shared driver for the incremental-view queries: stage HALF the
    tier's changelog via symlinks, replay + bootstrap the view, stage the
    rest, replay + advance (touched conversations only), return the
    view's ``read()`` or ``labels()``. One definition so the staging
    protocol (partition count, epoch granularity, compaction threshold)
    cannot drift between the view kinds. A tuple of class names maintains
    SEVERAL views over the one engine/replay (each advanced at both the
    bootstrap and incremental points) and returns them as a tuple —
    ``result`` must then be ``"__view__"``."""
    import importlib
    import tempfile

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    names = (view_cls_name,) if isinstance(view_cls_name, str) else tuple(view_cls_name)
    mod = importlib.import_module("etl_framework_ray.pipelines.incremental")
    sf = _sf_name(sf_dir)
    _ensure_changelog(sf)
    work = tempfile.mkdtemp(prefix=f"etl_{prefix}_{sf}_")
    staged = os.path.join(work, "log")
    os.makedirs(staged)
    first, rest = _split_segments(sf)  # the SAME split the oracles embed
    for f in first:
        os.symlink(f, os.path.join(staged, os.path.basename(f)))
    eng = CDCEngine(
        os.path.join(work, "transcripts"), num_partitions=32, compact_every=1_000_000
    )
    views = [
        getattr(mod, name)(
            eng, os.path.join(work, f"view{i}"), **(view_kwargs or {})
        )
        for i, name in enumerate(names)
    ]
    eng.replay(ChangeLog(staged), segments_per_epoch=1)
    for v in views:
        v.advance()  # bootstrap at the half-log state
    for f in rest:
        os.symlink(f, os.path.join(staged, os.path.basename(f)))
    eng.replay(ChangeLog(staged), segments_per_epoch=1)  # resumes from watermark
    for v in views:
        v.advance()  # incremental window: touched conversations only
    if not isinstance(view_cls_name, str):
        if result != "__view__":
            raise ValueError("multi-view staging returns views only")
        return tuple(views)
    if result == "__view__":
        return views[0]
    return getattr(views[0], result)()


def _cdc_rollup_incremental(sf_dir: str):
    """Incrementally-maintained gold rollup (IVM): replay HALF the log,
    bootstrap the view, replay the rest, advance — only the conversations
    changed in the second window recompute (pipelines/incremental.py).
    The final view must equal the full-recompute oracle byte-for-byte."""
    return _half_log_ivm(sf_dir, "IncrementalRollup", "ivm")


#: cdc_stats_incremental's configurable aggregate spec (StatsKernel):
#: exercises COUNT(*) vs COUNT(col), min/max on timestamp and int, and
#: exact (sum, count)-pair averages — one entry per supported fn
_STATS_AGGS = (
    ("n_turns", "count", "*"),
    ("n_tool_turns", "count", "tool"),
    ("first_ts", "min", "ts"),
    ("last_ts", "max", "ts"),
    ("max_turn_idx", "max", "turn_idx"),
    ("total_chars", "sum", "chars"),
    ("avg_chars", "avg", "chars"),
)


def _cdc_stats_incremental(sf_dir: str):
    """User-configurable aggregate view (IVM): a StatsKernel spec — no
    kernel class — maintained over the half-log/rest-of-log windows like
    the other incremental queries; the final view must equal the
    full-recompute SQL. ``avg_chars`` snaps to 6 decimals on both sides
    (CLAUDE.md float-aggregate rule)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    view = _half_log_ivm(
        sf_dir,
        "IncrementalStats",
        "stats",
        result="__view__",
        view_kwargs={"aggs": _STATS_AGGS},
    )

    def snap(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("avg_chars")
        snapped = pc.divide(
            pc.round(pc.multiply(batch.column("avg_chars"), pa.scalar(1e6))).cast(
                pa.int64()
            ),
            pa.scalar(1e6),
        )
        return batch.set_column(i, "avg_chars", snapped)

    return view.read().map_batches(snap, batch_format="pyarrow")


def _cdc_stats_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
        SELECT conv_id,
               COUNT(*) AS n_turns,
               COUNT(tool) AS n_tool_turns,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               CAST(MAX(turn_idx) AS BIGINT) AS max_turn_idx,
               CAST(SUM(length(text)) AS DOUBLE) AS total_chars,
               CAST(ROUND(AVG(length(text)) * 1000000) AS BIGINT) / 1000000.0
                   AS avg_chars
        FROM live GROUP BY conv_id
    """


def _cdc_changefeed_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    watermark = _CDC_SIZES[sf_name][0] // 2
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
            WHERE lsn > {watermark}
        )
        SELECT conv_id, turn_idx, role, text, ts, (op = 'D') AS deleted
        FROM ranked WHERE rn = 1
    """


def _cdc_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """


def _cdc_patch_oracle_sql(sf_name: str) -> str:
    """Global (ts, lsn)-ordered fold with partial images: the BASE is the
    key's last full image (op <> 'P'); patches after it apply column-wise
    (later patch wins per column; NULL = unchanged); patches at-or-below
    the base, on a deleted base, or with no base contribute nothing. The
    resolved ts is the last applied event's. Exact — validated against the
    engine's _fold_epoch_patches semantics case-by-case."""
    glob = os.path.join(
        os.path.join(CDC_CACHE_ROOT, sf_name, "changelog_patch"), "segment-*.parquet"
    )
    return f"""
        WITH ev AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts, lsn
            ) AS rn
            FROM read_parquet('{glob}')
        ), b AS (
            SELECT conv_id, turn_idx, max(rn) FILTER (WHERE op <> 'P') AS brn
            FROM ev GROUP BY conv_id, turn_idx
        ), j AS (
            SELECT e.*, b.brn FROM ev e
            JOIN b ON e.conv_id = b.conv_id AND e.turn_idx = b.turn_idx
            WHERE b.brn IS NOT NULL
        )
        SELECT conv_id, turn_idx,
            arg_max(role, rn) FILTER (WHERE rn = brn OR (rn > brn AND role IS NOT NULL)) AS role,
            arg_max(text, rn) FILTER (WHERE rn = brn OR (rn > brn AND text IS NOT NULL)) AS text,
            arg_max(tool, rn) FILTER (WHERE rn = brn OR (rn > brn AND tool IS NOT NULL)) AS tool,
            arg_max(ts,   rn) FILTER (WHERE rn >= brn) AS ts
        FROM j
        GROUP BY conv_id, turn_idx
        HAVING arg_max(op, rn) FILTER (WHERE rn = brn) <> 'D'
    """


def _cdc_version_diff_oracle_sql(sf_name: str) -> str:
    """LWW winners of the half log (lsn <= n/2 — exactly version 3's
    watermark: epochs are 2 segments of n/8 rows) vs the full log; a key
    appears iff its live state differs, tagged I/U/D (D rows carry keys
    only, payload NULL — same shape as CDCEngine.diff)."""
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    k = _CDC_SIZES[sf_name][0] // 2
    return f"""
        WITH full_r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn FROM read_parquet('{glob}')
        ), full_w AS (SELECT * FROM full_r WHERE rn = 1),
        half_r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn FROM read_parquet('{glob}') WHERE lsn <= {k}
        ), half_w AS (SELECT * FROM half_r WHERE rn = 1)
        SELECT 'I' AS diff_op, conv_id, turn_idx, role, text, tool, ts
        FROM full_w f
        WHERE f.op <> 'D' AND NOT EXISTS (
            SELECT 1 FROM half_w h
            WHERE h.conv_id = f.conv_id AND h.turn_idx = f.turn_idx AND h.op <> 'D')
        UNION ALL
        SELECT 'U', f.conv_id, f.turn_idx, f.role, f.text, f.tool, f.ts
        FROM full_w f JOIN half_w h
          ON f.conv_id = h.conv_id AND f.turn_idx = h.turn_idx
        WHERE f.op <> 'D' AND h.op <> 'D'
          AND (f.ts <> h.ts OR f.lsn <> h.lsn)
        UNION ALL
        SELECT 'D', h.conv_id, h.turn_idx,
               NULL, NULL, NULL, CAST(NULL AS TIMESTAMP)
        FROM half_w h
        WHERE h.op <> 'D' AND NOT EXISTS (
            SELECT 1 FROM full_w f
            WHERE f.conv_id = h.conv_id AND f.turn_idx = h.turn_idx AND f.op <> 'D')
    """


def _cdc_pruned_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        )
        SELECT conv_id, turn_idx, text, ts
        FROM ranked
        WHERE rn = 1 AND op <> 'D' AND role = 'user'
          AND conv_id >= 'conv-000010' AND conv_id < 'conv-000200'
    """


def _scd2_history_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        SELECT conv_id, turn_idx, role, text, tool,
               op AS change_op,
               ts AS valid_from_ts, lsn AS valid_from_lsn,
               LEAD(ts) OVER w AS valid_to_ts,
               LEAD(lsn) OVER w AS valid_to_lsn,
               (LEAD(lsn) OVER w IS NULL AND op <> 'D') AS is_current
        FROM read_parquet('{glob}')
        WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn)
    """


def _scd2_asof_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    k = _CDC_SIZES[sf_name][0] // 2
    return f"""
        WITH cut AS (
            SELECT max(ts) AS t FROM read_parquet('{glob}') WHERE lsn <= {k}
        ), ranked AS (
            SELECT e.*, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}') e, cut WHERE e.ts <= cut.t
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """


def _cdc_rollup_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, turn_idx, role, text, ts
            FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_assistant_turns,
               CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars,
               MAX(ts) AS last_ts
        FROM snap GROUP BY conv_id
    """


def _cdc_role_rollup_sets_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT role, text FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT role, CAST(GROUPING(role) AS BIGINT) AS grouping_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars
        FROM snap GROUP BY ROLLUP(role)
    """


def _cdc_corpus_incremental(sf_dir: str):
    """Incrementally-maintained SFT corpus (IVM over the changefeed):
    replay HALF the log, bootstrap the corpus view, replay the rest,
    advance — only touched conversations re-assemble. Must equal the
    full-assembly oracle byte-for-byte (same string_agg SQL as
    assemble_conversations)."""
    return _half_log_ivm(sf_dir, "IncrementalCorpus", "ivmc")

def _cdc_role_rollup_incremental(sf_dir: str):
    """IVM form of cdc_role_rollup_sets: the per-(conversation, role)
    stats view advances at O(touched conversations); the ROLLUP(role)
    report then derives from the VIEW alone (grouping_sets over
    O(convs×roles) rows — the lake is never re-read). Must equal the
    full-recompute composed oracle byte-for-byte."""
    view = _half_log_ivm(sf_dir, "IncrementalRoleStats", "ivmrs", result="__view__")
    return view.rollup()


def _cdc_bm25_incremental(sf_dir: str):
    """Incrementally-maintained FULL-TEXT INDEX (IVM over the changefeed):
    bootstrap the posting view at half the log, advance over the rest —
    only touched conversations re-tokenize — then answer BM25 top-k from
    the maintained postings. Must equal the composed oracle (string_agg
    assembly → regexp tokenize → BM25) over the LWW-resolved final state."""
    view = _half_log_ivm(sf_dir, "IncrementalTextIndex", "ivmt", result="__view__")
    return view.search(_BM25_CDC_QUERIES, k=_BM25_K)


def _cdc_window_incremental(sf_dir: str):
    """Incrementally-maintained TUMBLING-WINDOW view (IVM over the
    changefeed): bootstrap the (conversation, hour-window) activity view
    at half the log, advance over the rest — only touched conversations
    recompute. Must equal the date_trunc GROUP BY oracle over the
    LWW-resolved final state."""
    return _half_log_ivm(
        sf_dir, "IncrementalTimeRollup", "ivmw", view_kwargs={"window_s": 3600}
    )


def _cdc_window_incremental_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, text, ts FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT conv_id, date_trunc('hour', ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars
        FROM snap GROUP BY conv_id, date_trunc('hour', ts)
    """


#: cdc_vector_search query texts / k — shared by the Ray query and the
#: parquet artifacts its oracle reads
_VEC_QUERIES = ["assistant: here is the plan", "user: please summarize the results"]
_VEC_K = 10


def _vecsearch_dir(sf_name: str) -> str:
    return os.path.join(CDC_CACHE_ROOT, sf_name, "vecsearch")


def _cdc_vector_search(sf_dir: str):
    """Incrementally-maintained VECTOR index (IVM over the changefeed):
    bootstrap the embedding view at half the log, advance over the rest —
    only touched conversations re-embed — then answer cosine top-k from
    the maintained index (exact tier: radius=None scores every row).

    ORACLE-CHECKED: ``hash_embed`` is deterministic, so the query
    materializes two driver-tier parquet artifacts the SQL oracle reads —
    (a) embeddings recomputed FROM SCRATCH off the engine's committed
    snapshot (independent of the IVM view machinery: a maintenance bug in
    the view shifts the Ray top-k away from the oracle's) and (b) the
    query embeddings — and DuckDB reproduces the exact tier end-to-end
    (list_dot_product over the L2-normalized vectors = cosine, snapped to
    1e-6 BEFORE ranking on both sides, ties broken by conv_id). The LSH
    multiprobe tier and the advance≡rebuild equality stay pytest-verified
    (tests/test_vector_index.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_framework_ray.stages.similarity import hash_embed

    view = _half_log_ivm(sf_dir, "IncrementalVectorIndex", "ivmv", result="__view__")
    res = view.search(_VEC_QUERIES, k=_VEC_K, radius=None)

    # oracle artifacts (driver tier: O(convs) rows, 64 floats each) —
    # assembled through THE shared line/dialogue helpers (publish.py's
    # single-definition contract: a format change there moves this
    # oracle with it instead of silently drifting)
    from etl_framework_ray.pipelines.publish import join_dialogues, render_turn_lines

    kern = view.kernel
    snap = view.engine.snapshot_arrow().to_pandas()
    snap["line"] = render_turn_lines(snap["role"], snap["text"])
    docs = join_dialogues(snap[["conv_id", "turn_idx", "line"]]).to_pandas()
    V = hash_embed(docs["dialogue"], kern.dim, kern.seed)
    Q = hash_embed(_VEC_QUERIES, kern.dim, kern.seed)
    d = _vecsearch_dir(_sf_name(sf_dir))
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array(docs["conv_id"], pa.string()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.ravel(), pa.float32()), kern.dim
                ),
            }
        ),
        os.path.join(d, "index_vecs.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "query": pa.array(_VEC_QUERIES, pa.string()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(Q.ravel(), pa.float32()), kern.dim
                ),
            }
        ),
        os.path.join(d, "query_vecs.parquet"),
    )
    return res


def _vector_search_oracle_sql(sf_name: str) -> str:
    d = _vecsearch_dir(sf_name)
    return f"""
        WITH d AS (
            SELECT conv_id, CAST(vec AS DOUBLE[]) AS v
            FROM read_parquet('{os.path.join(d, "index_vecs.parquet")}')
        ), q AS (
            SELECT query, CAST(vec AS DOUBLE[]) AS v
            FROM read_parquet('{os.path.join(d, "query_vecs.parquet")}')
        ), s AS (
            SELECT q.query, d.conv_id,
                   CAST(ROUND(list_dot_product(q.v, d.v) * 1000000) AS BIGINT)
                       / 1000000.0 AS score
            FROM q CROSS JOIN d
        )
        SELECT query, conv_id, score,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank
        FROM s
        WINDOW w AS (PARTITION BY query ORDER BY score DESC, conv_id)
        QUALIFY ROW_NUMBER() OVER w <= {_VEC_K}
    """


def _cdc_dedup_incremental(sf_dir: str):
    """Incrementally-maintained EXACT-DEDUP index (IVM over the
    changefeed): bootstrap the fingerprint view at half the log, advance
    over the rest — only touched conversations re-fingerprint; labels
    derive from the maintained index with one slim (24 B/row) exchange.
    Must equal the window-function oracle over the LWW-resolved final
    state (min conv_id per assembled dialogue is canonical)."""
    return _half_log_ivm(sf_dir, "IncrementalDedup", "ivmd", result="labels")

def _dedup_labels_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, turn_idx, role, text
            FROM ranked WHERE rn = 1 AND op <> 'D'
        ), d AS (
            SELECT conv_id,
                   string_agg(COALESCE(role, '') || ': ' || COALESCE(text, ''),
                              chr(10) ORDER BY turn_idx) AS dialogue
            FROM snap GROUP BY conv_id
        )
        SELECT conv_id,
               MIN(conv_id) OVER (PARTITION BY dialogue) AS canonical_conv_id,
               conv_id <> MIN(conv_id) OVER (PARTITION BY dialogue) AS is_dup
        FROM d
    """


def _cdc_minhash_incremental(sf_dir: str):
    """Incrementally-maintained NEAR-dup (MinHash-LSH) index over the
    changefeed: bootstrap the signature view at half the log, advance
    over the rest (touched conversations re-sign only), then derive
    cluster labels from the signatures alone — banding + co-partitioned
    signature-Jaccard verify + distributed CC, never re-reading text.

    ORACLE-CHECKED via the exact-duplicate INVARIANT: identical dialogues
    have identical signatures, so any correct LSH pipeline must put every
    conversation in the same cluster as its exact-dup canonical. The query
    maintains the exact-fingerprint view (IncrementalDedup) beside the
    signature view over the SAME engine/replay, emits per conversation the
    SQL-checkable exact-dedup columns plus ``lsh_groups_exact_dups`` —
    cluster(conv) == cluster(exact canonical) — and the oracle asserts it
    TRUE for every row (a banding / verify / connected-components
    regression that splits identical signatures flips it). Near-dup
    recall beyond the exact subset stays pytest-verified on planted
    near-dups (tests/test_incremental.py) and measured at 10× scale by
    ``bench --dedup-scale``. The driver tier lifts the verify bucket cap
    (the capped path is the recall-tested 100 TB tier) so the invariant
    is exact, not probabilistic."""
    import pyarrow as pa

    mh_view, ex_view = _half_log_ivm(
        sf_dir, ("IncrementalMinHash", "IncrementalDedup"), "ivmm", result="__view__"
    )
    mh = mh_view.labels(max_bucket=1_000_000).to_pandas()
    ex = ex_view.labels().to_pandas()
    cluster_of = dict(zip(mh["conv_id"], mh["cluster_id"]))
    canon = ex["canonical_conv_id"].to_numpy(dtype=object)
    conv = ex["conv_id"].to_numpy(dtype=object)
    # membership is part of the invariant: a conversation MISSING from the
    # signature view (a maintenance bug that drops rows) must read False,
    # never vacuously True via None == None
    agree = [
        c in cluster_of and k in cluster_of and cluster_of[c] == cluster_of[k]
        for c, k in zip(conv, canon)
    ]
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "canonical_conv_id": pa.array(canon, pa.string()),
            "is_dup": pa.array(ex["is_dup"].to_numpy(), pa.bool_()),
            "lsh_groups_exact_dups": pa.array(agree, pa.bool_()),
        }
    )


def _minhash_invariant_oracle_sql(sf_name: str) -> str:
    """The exact-dedup window-function oracle plus the always-TRUE LSH
    invariant column (see _cdc_minhash_incremental)."""
    return (
        f"SELECT *, TRUE AS lsh_groups_exact_dups"
        f" FROM ({_dedup_labels_oracle_sql(sf_name)})"
    )

def _cdc_curation_incremental(sf_dir: str):
    """Incrementally-maintained CURATED pretraining corpus (IVM over the
    changefeed): bootstrap the funnel view (assemble -> PII-redact ->
    quality gate -> fingerprint) at half the log, advance over the rest
    (touched conversations only), then derive the kept corpus — quality-
    passing, exact-deduped on the redacted document. Must equal the
    full-recompute SQL funnel byte-for-byte. Thresholds are tuned so the
    quality gate SPLITS the generated corpus (both reject directions
    exercised); planted dup/redaction/delete lifecycles are pytest-covered
    (tests/test_incremental.py)."""
    return _half_log_ivm(
        sf_dir,
        "IncrementalCuration",
        "ivmq",
        result="corpus",
        view_kwargs={"min_turns": _CURATION_MIN_TURNS, "min_chars": _CURATION_MIN_CHARS},
    )


#: driver-query thresholds: chosen to SPLIT the generated corpus at the
#: driver tier (sf0.01 dialogues run 1299-2113 chars, 10-16 turns) so the
#: quality gate rejects real rows in both directions instead of passing
#: everything through
_CURATION_MIN_TURNS = 12
_CURATION_MIN_CHARS = 1700


def _curation_oracle_sql(sf_name: str) -> str:
    from etl_framework_ray.functions.text import PII_PATTERNS

    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    red = "dialogue"
    for _pat, _rep in PII_PATTERNS:
        red = f"regexp_replace({red}, '{_pat}', '{_rep}', 'g')"
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, turn_idx, role, text
            FROM ranked WHERE rn = 1 AND op <> 'D'
        ), d AS (
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   bool_or(role = 'user') AS has_u,
                   bool_or(role = 'assistant') AS has_a,
                   string_agg(COALESCE(role, '') || ': ' || COALESCE(text, ''),
                              chr(10) ORDER BY turn_idx) AS dialogue
            FROM snap GROUP BY conv_id
        ), q AS (
            SELECT conv_id, n_turns, {red} AS text, has_u, has_a
            FROM d
        ), pass AS (
            SELECT conv_id, n_turns, text FROM q
            WHERE n_turns >= {_CURATION_MIN_TURNS} AND has_u AND has_a
              AND length(text) >= {_CURATION_MIN_CHARS}
        )
        SELECT conv_id, n_turns, text FROM (
            SELECT conv_id, n_turns, text,
                   MIN(conv_id) OVER (PARTITION BY text) AS canon
            FROM pass
        ) WHERE conv_id = canon
    """


def _split_segments(sf_name: str, src: str | None = None) -> tuple[list, list]:
    """The half-log split shared by the IVM queries and their oracles:
    first half bootstraps, the rest is the incremental window."""
    src = src or _changelog_dir(sf_name)
    segs = sorted(f for f in os.listdir(src) if f.startswith("segment-"))
    half = max(1, len(segs) // 2)
    return (
        [os.path.join(src, f) for f in segs[:half]],
        [os.path.join(src, f) for f in segs[half:]],
    )


def _profile_changelog_dir(sf_name: str) -> str:
    return os.path.join(CDC_CACHE_ROOT, sf_name, "profile_changelog")


def _ensure_profile_changelog(sf_name: str) -> str:
    """Deterministic changelog for the conv_profile DIMENSION table (one
    row per conversation, same conv-id universe as the transcript log) —
    the second CDC source the incremental join view maintains against."""
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_profile_changelog

    d = _profile_changelog_dir(sf_name)
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    n_events, n_convs = _CDC_SIZES[sf_name]
    n_profile = max(1_000, n_events // 5)
    log = generate_profile_changelog(
        GenConfig(
            num_events=n_profile,
            num_conversations=n_convs,
            seed=_CDC_SEED,
            out_of_order=True,
        )
    )
    ChangeLog(d).write_segments(log, segment_rows=max(1_000, n_profile // 8))
    with open(done, "w") as f:
        f.write("ok")
    return d


def _shard_b_dir(sf_name: str) -> str:
    return os.path.join(CDC_CACHE_ROOT, sf_name, "shard_b_changelog")


def _ensure_shard_b(sf_name: str) -> str:
    """A second deterministic changelog SHARD over the same conversation
    universe (multi-source CDC fixture): independent seed and per-shard
    LSN space, timestamps offset +500 ms so no cross-shard event can tie
    with the primary shard's (the merge order is then SQL-expressible)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    d = _shard_b_dir(sf_name)
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    n_events, n_convs = _CDC_SIZES[sf_name]
    n_b = max(2_000, n_events // 4)
    log = generate_changelog(
        GenConfig(
            num_events=n_b,
            num_conversations=n_convs,
            seed=_CDC_SEED + 1,
            out_of_order=True,
        )
    )
    i = log.schema.get_field_index("ts")
    shifted = pc.add(log.column("ts").cast(pa.int64()), pa.scalar(500_000, pa.int64()))
    log = log.set_column(i, "ts", shifted.cast(pa.timestamp("us"))).cast(log.schema)
    ChangeLog(d).write_segments(log, segment_rows=max(1_000, n_b // 8))
    with open(done, "w") as f:
        f.write("ok")
    return d


def _cdc_multisource_replay(sf_dir: str):
    """Multi-source CDC: two independent changelog shards (overlapping
    per-shard LSN spaces, same conversation universe) merged into one
    canonical changelog under a dense global LSN
    (sources/multisource.MultiSourceFeed), then replayed. Must equal the
    (ts, lsn) LWW oracle over the UNION of both shards — unambiguous
    because the fixture makes cross-shard timestamp ties impossible."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.multisource import MultiSourceFeed

    sf = _sf_name(sf_dir)
    a = _ensure_changelog(sf)
    b = _ensure_shard_b(sf)
    work = tempfile.mkdtemp(prefix=f"etl_msrc_{sf}_")
    feed = MultiSourceFeed([a, b], os.path.join(work, "merged"))
    eng = CDCEngine(os.path.join(work, "transcripts"), num_partitions=32)
    eng.replay(feed, segments_per_epoch=2)

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return eng.snapshot().map_batches(narrow, batch_format="pyarrow")


def _cdc_multisource_oracle_sql(sf_name: str) -> str:
    a_glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    b_glob = os.path.join(_shard_b_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH shards AS (
            SELECT * FROM read_parquet('{a_glob}')
            UNION ALL
            SELECT * FROM read_parquet('{b_glob}')
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM shards
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """


def _cdc_join_incremental(sf_dir: str):
    """Incrementally-maintained JOIN view across two co-partitioned CDC
    tables (IVM over BOTH changefeeds): transcripts (fact) LEFT JOIN
    conv_profile (dimension) USING (conv_id). Replay half of each log,
    bootstrap the view, replay the rest of both, advance — only the
    conversations touched on EITHER side recompute, one task per touched
    partition, no shuffle. Must equal the SQL join of the two
    LWW-resolved final states byte-for-byte."""
    import tempfile

    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.incremental import IncrementalJoin
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.state.schema import CONV_PROFILE

    sf = _sf_name(sf_dir)
    _ensure_changelog(sf)
    _ensure_profile_changelog(sf)
    work = tempfile.mkdtemp(prefix=f"etl_ivmj_{sf}_")
    staged_t = os.path.join(work, "tlog")
    staged_p = os.path.join(work, "plog")
    os.makedirs(staged_t)
    os.makedirs(staged_p)
    t_first, t_rest = _split_segments(sf)
    p_first, p_rest = _split_segments(sf, _profile_changelog_dir(sf))
    for f in t_first:
        os.symlink(f, os.path.join(staged_t, os.path.basename(f)))
    for f in p_first:
        os.symlink(f, os.path.join(staged_p, os.path.basename(f)))
    L = CDCEngine(
        os.path.join(work, "transcripts"), num_partitions=32, compact_every=1_000_000
    )
    R = CDCEngine(
        os.path.join(work, "profile"),
        spec=CONV_PROFILE,
        num_partitions=32,
        compact_every=1_000_000,
    )
    view = IncrementalJoin(
        L, R, os.path.join(work, "view"), right_cols=["channel", "priority"], how="left"
    )
    L.replay(ChangeLog(staged_t), segments_per_epoch=1)
    R.replay(ChangeLog(staged_p), segments_per_epoch=1)
    view.advance()  # bootstrap at the half-log states
    for f in t_rest:
        os.symlink(f, os.path.join(staged_t, os.path.basename(f)))
    for f in p_rest:
        os.symlink(f, os.path.join(staged_p, os.path.basename(f)))
    L.replay(ChangeLog(staged_t), segments_per_epoch=1)
    R.replay(ChangeLog(staged_p), segments_per_epoch=1)
    view.advance()  # incremental window: union of touched conversations

    def narrow(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", batch.column("text").cast(pa.string()))

    return view.read().map_batches(narrow, batch_format="pyarrow")


def _cdc_join_oracle_sql(sf_name: str) -> str:
    t_glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    p_glob = os.path.join(_profile_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH t_ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{t_glob}')
        ), t_snap AS (
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM t_ranked WHERE rn = 1 AND op <> 'D'
        ), p_ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{p_glob}')
        ), p_snap AS (
            SELECT conv_id, channel, priority
            FROM p_ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
               p.channel, p.priority
        FROM t_snap t LEFT JOIN p_snap p USING (conv_id)
    """


def _cdc_view_changes(sf_dir: str):
    """The VIEW's own changefeed (views as CDC sources): bootstrap the
    rollup view at half the log (version 1), advance over the rest with
    emit_changes=True (version 2), and return the row-level delta the
    advance emitted — per-conversation REPLACE semantics: one U row per
    recomputed view row of each touched conversation, one null-payload D
    row per conversation that left the view. Must equal the SQL oracle
    computed from the two half-states."""
    view = _half_log_ivm(
        sf_dir,
        "IncrementalRollup",
        "ivmvc",
        result="__view__",
        view_kwargs={"emit_changes": True},
    )
    return view.changes(1).map_batches(
        lambda b: b.drop_columns(["version"]), batch_format="pyarrow"
    )


def _view_changes_oracle_sql(sf_name: str) -> str:
    first, rest = _split_segments(sf_name)
    first_l = "[" + ", ".join(f"'{f}'" for f in first) + "]"
    rest_l = "[" + ", ".join(f"'{f}'" for f in rest) + "]"
    return f"""
        WITH ranked_half AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet({first_l})
        ), half_live AS (
            SELECT DISTINCT conv_id FROM ranked_half WHERE rn = 1 AND op <> 'D'
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet({first_l} || {rest_l})
        ), snap AS (
            SELECT conv_id, turn_idx, role, text, ts
            FROM ranked WHERE rn = 1 AND op <> 'D'
        ), full_roll AS (
            SELECT conv_id,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_assistant_turns,
                   CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars,
                   MAX(ts) AS last_ts
            FROM snap GROUP BY conv_id
        ), touched AS (
            SELECT DISTINCT conv_id FROM read_parquet({rest_l})
        )
        SELECT 'U' AS op, f.conv_id, f.n_turns, f.n_assistant_turns,
               f.total_chars, f.last_ts
        FROM full_roll f JOIN touched USING (conv_id)
        UNION ALL
        SELECT 'D' AS op, t.conv_id,
               CAST(NULL AS BIGINT) AS n_turns,
               CAST(NULL AS BIGINT) AS n_assistant_turns,
               CAST(NULL AS BIGINT) AS total_chars,
               CAST(NULL AS TIMESTAMP) AS last_ts
        FROM touched t
        JOIN half_live h USING (conv_id)
        LEFT JOIN full_roll f USING (conv_id)
        WHERE f.conv_id IS NULL
    """


def _cdc_replica(sf_dir: str):
    """The FULL view-replication chain, oracle-checked: bootstrap the
    rollup view at half the log and seed a downstream replica from its
    exactly-once window export; advance over the rest, export the delta
    window, apply it to the replica (one task per touched partition,
    idempotent by version). The REPLICA — which never reads the view or
    the lake — must equal the full-recompute rollup SQL byte-for-byte."""
    import tempfile

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.consumer import ViewDeltaConsumer
    from etl_framework_ray.pipelines.incremental import IncrementalRollup
    from etl_framework_ray.pipelines.replica import ReplicaTable
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    _ensure_changelog(sf)
    work = tempfile.mkdtemp(prefix=f"etl_repl_{sf}_")
    staged = os.path.join(work, "log")
    os.makedirs(staged)
    first, rest = _split_segments(sf)
    for f in first:
        os.symlink(f, os.path.join(staged, os.path.basename(f)))
    eng = CDCEngine(
        os.path.join(work, "transcripts"), num_partitions=32, compact_every=1_000_000
    )
    view = IncrementalRollup(eng, os.path.join(work, "view"), emit_changes=True)
    con = ViewDeltaConsumer(view, os.path.join(work, "sink"))
    rep = ReplicaTable(os.path.join(work, "replica"), num_partitions=32)
    eng.replay(ChangeLog(staged), segments_per_epoch=1)
    view.advance()
    con.seed_from_view()
    rep.follow(con)
    for f in rest:
        os.symlink(f, os.path.join(staged, os.path.basename(f)))
    eng.replay(ChangeLog(staged), segments_per_epoch=1)
    view.advance()  # touched conversations only
    con.poll()  # one exactly-once delta window
    rep.follow(con)  # replica applies it, never reading the view
    return rep.read()


def _cdc_tool_usage_incremental(sf_dir: str):
    """Incrementally-maintained per-(conversation, tool) call counts (IVM
    over the changefeed): bootstrap at half the log, advance over the
    rest — must equal the full-state oracle (group-by over the
    LWW-resolved final table)."""
    return _half_log_ivm(sf_dir, "IncrementalToolUsage", "ivmt")

def _tool_usage_view_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, tool
            FROM ranked WHERE rn = 1 AND op <> 'D' AND tool IS NOT NULL
        )
        SELECT conv_id, tool, CAST(COUNT(*) AS BIGINT) AS calls
        FROM snap GROUP BY conv_id, tool
    """


def _assemble_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, turn_idx, role, text
            FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               string_agg(COALESCE(role, '') || ': ' || COALESCE(text, ''),
                          chr(10) ORDER BY turn_idx) AS dialogue
        FROM snap GROUP BY conv_id
    """


def _tool_usage_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, tool
            FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT tool,
               CAST(COUNT(*) AS BIGINT) AS n_calls,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
        FROM snap WHERE tool IS NOT NULL GROUP BY tool
    """


def _windows_oracle_sql(sf_name: str, k: int = 4) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, turn_idx, role, text
            FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT conv_id, turn_idx,
               string_agg(COALESCE(role, '') || ': ' || COALESCE(text, ''),
                          chr(10)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW) AS context
        FROM snap
    """


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline at sf0.001: CDC changelog replay → committed
    snapshot Dataset."""
    return _cdc_replay("/root/testdata/sf0.001")


def _q_text_stats(sf_dir: str):
    import ray.data

    from etl_framework_ray.functions.text import text_stats

    return (
        ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(text_stats, batch_format="pyarrow")
        .drop_columns(["text"])
    )


def _q_doc_chunks_packed(sf_dir: str):
    """Chunk documents into 128-token windows, pack into 512-token
    sequences (partition-local first-fit) — rows-only (packing layout is
    partitioning-dependent by design; budget/coverage invariants are
    unit-tested)."""
    import ray.data

    from etl_framework_ray.stages.packing import chunk_documents, pack_chunks

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return pack_chunks(chunk_documents(ds, max_tokens=128, overlap=16), budget=512).drop_columns(
        ["text"]
    )


def _q_sample_docs(sf_dir: str):
    """Deterministic 10% sample by key modulus — SQL-identical predicate."""
    import ray.data

    from etl_framework_ray.stages.packing import sample_mod

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    return sample_mod(ds, 10, key_col="doc_id")


def _q_price_quantiles(sf_dir: str):
    """Distributed exact rank-select quantiles (histogram refinement)."""
    import ray.data

    from etl_framework_ray.stages.quantiles import rank_select_quantiles

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    return rank_select_quantiles(ds, "l_extendedprice", (0.5, 0.9, 0.99))


def _q_price_quantiles_approx(sf_dir: str):
    """One-pass approximate quantile sketch (per-block equi-weight
    summaries, log-depth task-tree merge) — the single-scan sibling of
    the exact rank-select tier; tolerance-checked by the gate mirror."""
    import ray.data

    from etl_framework_ray.stages.quantiles import approx_quantiles

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    return approx_quantiles(ds, "l_extendedprice", (0.5, 0.9, 0.99))


def _q_top_events_per_user(sf_dir: str):
    """Generic per-group top-k (value DESC, event_id tie-break)."""
    import ray.data

    from etl_framework_ray.stages.joins import group_topk

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_id", "value"]
    )
    return group_topk(
        ds, "user_id", ["value", "event_id"], k=3, descending=[True, False]
    )


def _q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct-user count over events — one
    4 KiB sketch per block instead of an all-to-all key shuffle;
    rows-only (accuracy asserted vs exact in tests)."""
    import pyarrow as pa
    import ray.data

    from etl_framework_ray.stages.sketches import hll_distinct

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    est = hll_distinct(ds, "user_id", p=12)
    return pa.table({"approx_distinct_users": pa.array([round(est)], pa.int64())})


def _q_distinct_users_by_type(sf_dir: str):
    """Grouped HyperLogLog: approximate distinct users per event type —
    per-group mergeable register partials co-located on the direct
    exchange; rows-only (accuracy + partition invariance tested)."""
    import ray.data

    from etl_framework_ray.stages.sketches import hll_distinct_by

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return hll_distinct_by(ds, "event_type", "user_id", p=12)


def _q_normalize_text(sf_dir: str):
    import ray.data

    from etl_framework_ray.functions.text import normalize_text

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(normalize_text, batch_format="pyarrow")


def _q_top_tokens(sf_dir: str):
    import ray.data

    from etl_framework_ray.functions.text import token_counts

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    return token_counts(ds, k=100)


def _q_redact_pii(sf_dir: str):
    """PII scrubbing with a byte-parity oracle. The synthetic corpus holds
    no PII, so BOTH sides append the same deterministic PII suffix (built
    from doc_id) before redacting — the regexp chain is exercised for
    real, byte-for-byte (both engines run RE2)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from etl_framework_ray.functions.text import redact_pii

    def add_pii_then_redact(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string())
        octet = pc.cast(pc.bit_wise_and(batch.column("doc_id"), 255), pa.string())
        text = pc.binary_join_element_wise(
            batch.column("text"),
            " contact user", ids, "@mail.example.com or +1 555-123-4567 ip 10.0.",
            octet, ".7 ssn 123-45-6789",
            "",
        )
        i = batch.schema.get_field_index("text")
        return redact_pii(batch.set_column(i, "text", text))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(add_pii_then_redact, batch_format="pyarrow")


def _q_decontaminate(sf_dir: str):
    """Benchmark n-gram decontamination: docs with doc_id % 20 == 0 stand
    in as the eval suite; every other doc sharing an 8-token shingle with
    them is dropped. Benchmark texts are DRIVER-COLLECTED by design — the
    eval side is a suite, not a corpus — then broadcast as one sorted
    uint64 hash array (stages/contamination.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from etl_framework_ray.stages.contamination import decontaminate

    path = os.path.join(sf_dir, "documents.parquet")
    bt = pq.read_table(path, columns=["doc_id", "text"])
    bench = bt.filter(pa.array(bt.column("doc_id").to_numpy() % 20 == 0)).column("text")

    def non_bench(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch.column("doc_id").to_numpy() % 20 != 0))

    corpus = ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        non_bench, batch_format="pyarrow"
    )
    return decontaminate(corpus, bench, n=8).select_columns(["doc_id"])


def _q_exact_dedup(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.dedup import exact_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


def _q_embedding_dedup(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.dedup import embedding_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_dedup(ds, threshold=0.95).select_columns(["vec_id", "is_dup"])


def _q_embedding_dedup_lsh(sf_dir: str):
    """Bucketed (hyperplane-LSH, hamming-1 multiprobe) near-dup flagging —
    the scale path of embedding_dedup; rows-only check (approximate)."""
    import ray.data

    from etl_framework_ray.stages.dedup import embedding_dedup_lsh

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_dedup_lsh(ds, threshold=0.95).select_columns(["vec_id", "is_dup"])


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style near-dup flagging: spherical-k-means clusters as the
    candidate generator, within-cluster greedy-by-id cosine prune —
    rows-only check (approximate; recall vs the exact tier is tested)."""
    import ray.data

    from etl_framework_ray.stages.dedup import semantic_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semantic_dedup(ds, threshold=0.95, k=16).select_columns(["vec_id", "is_dup"])


def _q_ann_topk(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.similarity import ann_topk

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_topk(ds, query_ids=[0, 1, 2, 3, 4], k=5)


def _q_minhash_dedup(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.dedup import minhash_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return minhash_dedup(ds)


def _q_simhash_dedup(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.dedup import simhash_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return simhash_dedup(ds)


def _q_ngram_jaccard_dedup(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.dedup import ngram_jaccard_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ngram_jaccard_dedup(ds)


def _q_langid(sf_dir: str):
    import ray.data

    from etl_framework_ray.functions.text import LangId
    from etl_framework_ray.stages.util import cached_stage

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(cached_stage(LangId), batch_format="pyarrow").drop_columns(["text"])


def _q_quality_score(sf_dir: str):
    """Heuristic quality scoring — ORACLE-CHECKED (round 5): the score is
    deterministic regex arithmetic (RE2 counts + a 12-word stopword list
    + fixed weights), so DuckDB reproduces it exactly on this ASCII
    corpus; the three float columns snap to 1e-9 on both sides
    (CLAUDE.md float rule)."""
    import pyarrow as pa
    import ray.data

    from etl_framework_ray.functions.text import QualityScorer
    from etl_framework_ray.stages.util import cached_stage

    import numpy as np

    def snap(batch: pa.Table) -> pa.Table:
        for col in ("punct_ratio", "stop_ratio", "quality_score"):
            i = batch.schema.get_field_index(col)
            v = batch.column(col).to_numpy(zero_copy_only=False)
            batch = batch.set_column(
                i, col, pa.array(np.round(v * 1e9).astype(np.int64) / 1e9)
            )
        return batch

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return (
        ds.map_batches(cached_stage(QualityScorer), batch_format="pyarrow")
        .drop_columns(["text"])
        .map_batches(snap, batch_format="pyarrow")
    )


def _lm_perplexity_oracle_sql() -> str:
    """The bigram LM as SQL (valid because the corpus vocab fits the cut
    — see _q_lm_perplexity): seq = (prev, cur) per token with a BOS
    sentinel no real token can equal (tokens never contain spaces)."""
    from etl_framework_ray.functions.text import TOKEN_PATTERN

    return f"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_extract_all(lower(COALESCE(text, '')), '{TOKEN_PATTERN}') AS t
            FROM documents
        ), seq AS (
            SELECT doc_id, t[i] AS cur,
                   CASE WHEN i = 1 THEN ' BOS ' ELSE t[i - 1] END AS prev
            FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
        ), uni AS (SELECT cur AS tok, COUNT(*) AS n FROM seq GROUP BY 1),
        bi AS (SELECT prev, cur, COUNT(*) AS n FROM seq GROUP BY 1, 2),
        v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
        logp AS (
            SELECT s.doc_id,
                   log2((b.n + 0.1) / (COALESCE(u.n, 0) + 0.1 * (v.v + 1))) AS lp
            FROM seq s
            JOIN bi b ON b.prev = s.prev AND b.cur = s.cur
            LEFT JOIN uni u ON u.tok = s.prev
            CROSS JOIN v
        ), agg AS (
            SELECT doc_id, POWER(2.0, -AVG(lp)) AS ppl FROM logp GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(ROUND(a.ppl * 10000) AS BIGINT) / 10000.0 AS ppl
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """


def _langid_oracle_sql() -> str:
    """LangId is deterministic stopword-hit argmax (ties alphabetical —
    pandas ``idxmax`` over lexicographically-ordered unstacked columns)
    with a CJK codepoint-ratio override; every step is SQL on this ASCII
    corpus (RE2 vs Python-re class semantics agree on ASCII)."""
    from etl_framework_ray.functions.text import _STOPWORDS

    rows = ", ".join(
        f"('{w}', '{lang}')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
    )
    return f"""
        WITH profile(token, lang) AS (VALUES {rows}),
        toks AS (
            SELECT doc_id,
                   UNNEST(regexp_extract_all(lower(COALESCE(text, '')), '[^\\W\\d_]+')) AS token
            FROM documents
        ), hits AS (
            SELECT t.doc_id, p.lang, COUNT(*) AS n
            FROM toks t JOIN profile p ON p.token = t.token
            GROUP BY t.doc_id, p.lang
        ), best AS (
            SELECT doc_id, lang
            FROM hits
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY n DESC, lang ASC
            ) = 1
        )
        SELECT d.doc_id,
               CASE WHEN len(regexp_extract_all(COALESCE(d.text, ''), '[一-鿿]')) * 1.0
                         / GREATEST(length(COALESCE(d.text, '')), 1) > 0.2
                    THEN 'zh'
                    ELSE COALESCE(b.lang, 'unknown')
               END AS lang_pred
        FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
    """


def _quality_score_oracle_sql() -> str:
    from etl_framework_ray.functions.text import _STOPWORDS

    stop = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS["en"]))
    snap = "CAST(ROUND(({x}) * 1000000000) AS BIGINT) / 1000000000.0"
    return f"""
        WITH q AS (
            SELECT doc_id,
                   GREATEST(length(COALESCE(text, '')), 1) AS n_chars,
                   len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS n_tokens,
                   len(regexp_extract_all(COALESCE(text, ''), '[^\\w\\s]')) AS n_punct,
                   len(list_filter(regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+'),
                                   t -> list_contains([{stop}], t))) AS n_stop
            FROM documents
        ), r AS (
            SELECT doc_id,
                   n_punct * 1.0 / n_chars AS punct_ratio,
                   n_stop * 1.0 / GREATEST(n_tokens, 1) AS stop_ratio,
                   SQRT(LEAST(n_tokens, 512) / 512.0) AS len_score
            FROM q
        )
        SELECT doc_id,
               {snap.format(x="punct_ratio")} AS punct_ratio,
               {snap.format(x="stop_ratio")} AS stop_ratio,
               {snap.format(x="0.4 * len_score + 0.3 * (1.0 - LEAST(punct_ratio, 1.0))"
                              " + 0.3 * LEAST(stop_ratio, 1.0)")} AS quality_score
        FROM r
    """


def _q_fingerprint(sf_dir: str):
    import ray.data

    from etl_framework_ray.functions.text import fingerprint_batch

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").drop_columns(["text"])


def _q_ann_lsh(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.similarity import ann_lsh_topk

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_lsh_topk(ds, query_ids=[0, 1, 2, 3, 4], k=5)


def _q_ann_ivf(sf_dir: str):
    """IVF (k-means coarse quantizer) approximate top-k — rows-only."""
    import ray.data

    from etl_framework_ray.stages.similarity import ann_ivf_topk

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_ivf_topk(ds, query_ids=[0, 1, 2, 3, 4], k=5, nlist=8, nprobe=4)


def _q_multimodal_decode(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.multimodal import decode_images, synth_media_batch

    ds = ray.data.from_arrow(synth_media_batch(256, seed=7))
    return decode_images(ds, batch_size=32, concurrency=(1, 2))


def _q_curate_documents(sf_dir: str):
    from etl_framework_ray.pipelines.curation import curate_documents

    ds, _funnel = curate_documents(sf_dir, report=False)
    return ds.select_columns(["doc_id", "lang_pred", "quality_score", "n_tokens"])


#: shared by the scan-tier query, the indexed-tier query and their ONE SQL
#: oracle — the two tiers are score-identical by construction (search.py)
_BM25_QUERIES = {0: ["hash", "join"], 1: ["stream", "window"], 2: ["merge", "sort", "vector"]}
_BM25_K = 10
#: the incremental-index query's terms, drawn from the transcript corpus
_BM25_CDC_QUERIES = {0: ["rev", "7"], 1: ["tool", "12"], 2: ["assistant", "3"]}


def _q_events_except_all(sf_dir: str):
    """Multiset EXCEPT ALL (stages/setops.py — bag semantics no join
    composition reproduces): per-(user, event_type) activity present in
    the even-event_id shard beyond its multiplicity in the odd shard.
    Duplicates collapse to (row, count) partials per block BEFORE the
    exchange; one kernel per bucket merges counts and re-expands."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from etl_framework_ray.stages.setops import except_all

    path = os.path.join(sf_dir, "events.parquet")
    cols = ["user_id", "event_type", "event_id"]

    def shard(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t.column("event_id"), 1), parity)
            return t.filter(keep).select(["user_id", "event_type"])

        return ray.data.read_parquet(path, columns=cols).map_batches(
            fn, batch_format="pyarrow"
        )

    return except_all(shard(0), shard(1))


def _q_lineitem_unpivot(sf_dir: str):
    """Wide → long reshape (stages/pivot.unpivot — the inverse of the
    pivot operator): four lineitem measures melt to (name, value) rows,
    SQL UNPIVOT parity incl. NULL-drop. Pure map stage, no shuffle."""
    import ray.data

    from etl_framework_ray.stages.pivot import unpivot

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", *cols],
    )
    return unpivot(ds, ["l_orderkey", "l_linenumber"], cols)


def _q_revenue_bucketed(sf_dir: str):
    """ZERO-SHUFFLE join via the bucketed table layout
    (stages/bucketed.py): orders and customer are written hash-bucketed
    by custkey once (the pipeline's ONE partitioning key), then the join
    runs one task per bucket pair reading only its own files — no
    exchange at all. Same oracle as revenue_by_mktsegment: the layouts
    must be semantically invisible."""
    import tempfile

    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from etl_framework_ray.pipelines.medallion import _read, _round_cols
    from etl_framework_ray.stages.bucketed import bucketed_equi_join, write_bucketed

    work = tempfile.mkdtemp(prefix="etl_bucketed_")
    od, cd = os.path.join(work, "orders"), os.path.join(work, "customer")
    write_bucketed(_read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
                   od, "o_custkey", num_buckets=16)
    write_bucketed(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
                   cd, "c_custkey", num_buckets=16)
    joined = bucketed_equi_join(od, cd, "o_custkey", "c_custkey", ["c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        from etl_framework_ray.pipelines.cdc import _single_threaded_arrow

        _single_threaded_arrow()
        g = batch.group_by("r_c_mktsegment", use_threads=False).aggregate(
            [("o_totalprice", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "revenue"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(_round_cols(["revenue"]), batch_format="pyarrow")
    )


def _q_lm_perplexity(sf_dir: str):
    """Bigram-LM perplexity scoring (stages/lm.py — the CCNet-family
    quality filter): train on the documents corpus (bounded vocab,
    tree-merged counts, ONE broadcast), score every doc in one
    vectorized pass.

    ORACLE-CHECKED (round 5): this corpus's vocabulary (~31 word tokens +
    punctuation) sits far below the 65 536 cut, so the trained model is
    EXACTLY the corpus bigram/unigram counts and DuckDB reproduces the
    whole thing — counts, add-k smoothing, BOS context falling back to
    prev-count 0, 2^(−mean log2 p) — with ppl snapped to 1e-4 on both
    sides. (On a corpus that DOES overflow the cut, the top-V tie-break
    happens in hash order and the oracle would no longer apply — the
    pytest row-at-a-time parity suite covers that regime.)"""
    import pyarrow as pa
    import ray.data

    from etl_framework_ray.stages.lm import score_perplexity, train_ngram_lm

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    model = train_ngram_lm(ds)
    return score_perplexity(ds, model).map_batches(
        lambda t: t.select(["doc_id", "ppl"]), batch_format="pyarrow"
    )


def _q_uniform_sample_orders(sf_dir: str):
    """EXACTLY-k distributed uniform sample (stages/packing.bottom_k_sample):
    bottom-1000 orders by a deterministic md5 sample key — per-block local
    bottom-k, one merge, the dataset never shuffles. The md5 key is chosen
    precisely because DuckDB computes the identical value, making an
    exactly-k random sample EXACTLY oracle-checkable."""
    import ray.data

    from etl_framework_ray.stages.packing import bottom_k_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return bottom_k_sample(ds, 1000, "o_orderkey", seed=7)


def _q_sample_events_per_user(sf_dir: str):
    """EXACTLY-k-per-group sample (bottom_k_per_group on the group_topk
    machinery): 3 events per user by the md5 key."""
    import ray.data

    from etl_framework_ray.stages.packing import bottom_k_per_group

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "event_type"],
    )
    return bottom_k_per_group(ds, 3, "user_id", "event_id", seed=11)


def _q_similar_docs(sf_dir: str):
    """EXACT trigram-Jaccard similarity self-join (stages/fuzzy.py —
    AllPairs/PPJoin prefix filtering): every document pair with char-3gram
    Jaccard >= 0.7, verified exactly. The deterministic counterpart of
    minhash_dedup, with a full SQL oracle (UNNEST trigrams -> set
    intersection) instead of a recall bound. ORACLE TIER: runs on a
    deterministic 500-doc slice — the exact join's cost is
    output-sensitive (Θ(pairs sharing a prefix token)); the synthetic
    corpus's 300-trigram vocabulary makes the full table adversarial for
    prefix filtering (fuzzy.py docstring), and minhash_dedup is the
    scale path."""
    import pyarrow.dataset as pads
    import ray.data

    from etl_framework_ray.stages.fuzzy import similarity_join

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < 500,
    )
    return similarity_join(ds, threshold=0.7)


def _q_bm25_topk(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.search import bm25_topk

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bm25_topk(ds, _BM25_QUERIES, k=_BM25_K)


def _q_bm25_search(sf_dir: str):
    """Indexed tier: build the token-bucketed inverted index once per
    (process, tier) — the atomic-rename commit makes the cached-dir check
    race-free — then answer from posting buckets only."""
    import tempfile

    import ray.data

    from etl_framework_ray.stages.search import bm25_search, build_text_index

    idx = os.path.join(
        tempfile.gettempdir(), f"etl_bm25_idx_{_sf_name(sf_dir)}_{os.getpid()}"
    )
    if not os.path.exists(idx):
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        build_text_index(ds, idx)
    return bm25_search(idx, _BM25_QUERIES, k=_BM25_K)


def _q_multimodal_audio(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.multimodal import AudioFeatures, synth_audio_batch

    ds = ray.data.from_arrow(synth_audio_batch(128, seed=8))
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=(1, 2)
    )


def _q_multimodal_frames(sf_dir: str):
    """Video → sampled frames → image features (composed media fan-out)."""
    import ray.data

    from etl_framework_ray.stages.multimodal import ImageDecoder, sample_frames, synth_video_batch

    ds = ray.data.from_arrow(synth_video_batch(64, seed=9))
    return sample_frames(ds, every_k=4, batch_size=8, concurrency=(1, 2)).map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=32, concurrency=(1, 2)
    )


def _q_orders_7d_by_event(sf_dir: str):
    """Range join + aggregate: per event, count/sum the customer's orders
    in the trailing 7 days (two searchsorted per left row — never the
    O(L×R) pairing the SQL formulation implies)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from etl_framework_ray.stages.joins import trailing_window_join

    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = trailing_window_join(
        events,
        orders,
        left_by="user_id",
        right_by="o_custkey",
        left_on="ts",
        right_on="o_orderdate",
        value_col="o_totalprice",
        span_s=7 * 86400,
        count_name="n_orders_7d",
        sum_name="_raw_sum",
    )

    def finish(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(batch.column("_raw_sum"), pa.scalar(100.0)), 0)
        total = pc.divide(pc.cast(cents, pa.int64()).cast(pa.float64()), pa.scalar(100.0))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "n_orders_7d": batch.column("n_orders_7d"),
                "total_7d": total,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_tumbling(sf_dir: str):
    from etl_framework_ray.pipelines.windows import tumbling_counts

    return tumbling_counts(sf_dir, window_s=3600)


def _q_hopping(sf_dir: str):
    from etl_framework_ray.pipelines.windows import hopping_counts

    return hopping_counts(sf_dir, window_s=3600, hop_s=900)


def _q_events_last_order(sf_dir: str):
    """As-of join: each event picks up the latest order (by date ≤ event
    time) of the same customer — point-in-time-correct lookup."""
    import pyarrow as pa
    import ray.data

    from etl_framework_ray.stages.joins import asof_join

    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    # deterministic ties: max orderkey per (custkey, date), resolved
    # vectorized inside the exchange's bucket kernels (tie_break="max") —
    # the former groupby().max() pre-reduce cost 5.1 s of sort-shuffle
    # fixed overhead at sf0.1 vs 1.0 s for the whole join
    joined = asof_join(
        events,
        orders,
        left_by="user_id",
        right_by="o_custkey",
        left_on="ts",
        right_on="o_orderdate",
        right_cols=["o_orderkey"],
        tie_break="max",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "last_order_key": batch.column("r_o_orderkey").cast(pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _q_sessions(sf_dir: str):
    from etl_framework_ray.pipelines.windows import session_windows

    return session_windows(sf_dir, gap_s=1800)


def _q_repetition_stats(sf_dir: str):
    import ray.data

    from etl_framework_ray.functions.text import repetition_stats

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(repetition_stats, batch_format="pyarrow")


#: per-language sampling rates for the stratified mixture query (percent
#: kept; the oracle states the identical CASE predicate)
_MIXTURE_RATES = {"en": 25, "zh": 80, "es": 60}


def _q_stratified_sample(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.packing import stratified_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
    )
    return stratified_sample(ds, _MIXTURE_RATES, group_col="lang", default_pct=50)


def _q_assemble_conversations(sf_dir: str):
    """Transcripts → SFT corpus: replay the changelog, then render each
    conversation as one role-tagged training document (publish.py)."""
    import tempfile

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.publish import assemble_conversations
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_sft_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    return assemble_conversations(eng.snapshot())


def _q_pretraining_corpus(sf_dir: str):
    """The composed pretraining-prep flagship: curate → repetition gate →
    decontaminate (docs with doc_id % 20 == 0 stand in as the eval suite)
    → mixture re-weight → chunk + pack (pipelines/curation.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_framework_ray.pipelines.curation import prepare_pretraining_corpus

    path = os.path.join(sf_dir, "documents.parquet")
    bt = pq.read_table(path, columns=["doc_id", "text"])
    bench = bt.filter(pa.array(bt.column("doc_id").to_numpy() % 20 == 0)).column("text")
    packed, _funnel = prepare_pretraining_corpus(
        sf_dir,
        mixture={"en": 70},
        bench_texts=bench.to_pylist(),
        max_tokens=64,
        overlap=8,
        pack_budget=256,
        report=False,
    )
    return packed


def _q_grouped_quantiles(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.quantiles import grouped_rank_select_quantiles

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return grouped_rank_select_quantiles(ds, "event_type", "value")


def _q_bloom_semijoin(sf_dir: str):
    """Bloom-prefiltered exact semi-join: lineitems of high-value orders,
    rolled up per returnflag (stages/sketches.bloom_semijoin — the probe
    drops ~80% of the big side before the exact verify)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from etl_framework_ray.stages.sketches import bloom_semijoin

    hi = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    ).filter(expr="o_totalprice > 400000")
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_returnflag"],
    )
    j = bloom_semijoin(li, "l_orderkey", hi, "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "l_returnflag": batch.column("l_returnflag").to_pandas(),
                "qty": batch.column("l_quantity").to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("l_returnflag", sort=False).agg(
            n_items=("qty", "size"), sum_qty=("qty", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("sum_qty", alias_name="sum_qty"))
    )

    def snap(batch: pa.Table) -> pa.Table:
        q = batch.column("sum_qty").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "n_items": batch.column("n_items").cast(pa.int64()),
                "sum_qty": pa.array(np.round(q).astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(snap, batch_format="pyarrow")


def _q_tool_usage(sf_dir: str):
    """Agent-telemetry rollup of the transcript lake's tool column
    (publish.tool_usage; pre-aggregated (tool, conv) grain)."""
    import tempfile

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.publish import tool_usage
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_tool_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    return tool_usage(eng.snapshot())


def _q_conversation_windows(sf_dir: str):
    """Rolling 4-turn dialogue contexts over the replayed transcript lake
    (publish.conversation_windows; oracle is the windowed string_agg)."""
    import tempfile

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.pipelines.publish import conversation_windows
    from etl_framework_ray.sources.changelog import ChangeLog

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_ctx_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    return conversation_windows(eng.snapshot(), k=4)


def _q_cluster_embeddings(sf_dir: str):
    import ray.data

    from etl_framework_ray.stages.similarity import cluster_embeddings

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return cluster_embeddings(ds, k=16)


def _q_event_gaps(sf_dir: str):
    """Per-user event sequencing: ROW_NUMBER + inter-event gap (µs) via
    LAG over (ts, event_id) — the window/analytic family on the direct
    exchange (stages/analytic.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from etl_framework_ray.stages.analytic import lag, row_number, window

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_id", "ts"]
    )
    out = window(ds, "user_id", ["ts", "event_id"], [row_number("seq"), lag("ts", "prev_ts")])

    def gap(batch: pa.Table) -> pa.Table:
        g = pc.subtract(
            batch.column("ts").cast(pa.int64()), batch.column("prev_ts").cast(pa.int64())
        )
        return batch.drop_columns(["prev_ts"]).append_column("gap_us", g)

    return out.map_batches(gap, batch_format="pyarrow")


def _q_global_quantity_ranks(sf_dir: str):
    """GLOBAL total-order ranking (empty OVER partition — the distributed
    ORDER BY, stages/ranking.py): every lineitem ranked corpus-wide by
    quantity DESC; rank/dense_rank treat equal quantities as peers,
    row_number is made total by the PK tie-break. The range exchange
    guarantees peer co-location so per-bucket rank arithmetic is exact."""
    import ray.data

    from etl_framework_ray.stages.ranking import global_ranks

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    return global_ranks(
        ds,
        ["l_quantity", "l_orderkey", "l_linenumber"],
        descending=[True, False, False],
        peer_cols=1,
    )


def _q_customer_order_ranks(sf_dir: str):
    """Per-customer order analytics in ONE window pass: sequence number,
    RANK over order date (ties share rank), next order date (LEAD), and
    exact running spend in integer cents (running SUM — no float drift)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from etl_framework_ray.stages.analytic import (
        lead,
        ntile,
        percent_rank,
        rank,
        row_number,
        running_sum,
        window,
    )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100.0), 0), pa.int64())
        return batch.drop_columns(["o_totalprice"]).append_column("price_cents", c)

    return window(
        ds.map_batches(cents, batch_format="pyarrow"),
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
        [
            row_number("order_seq"),
            rank("date_rank", on=1),
            lead("o_orderdate", "next_order_date"),
            running_sum("price_cents", "spend_to_date_cents"),
            ntile(4, "time_quartile"),
            percent_rank("date_pct_rank", on=1),
        ],
    )


def _q_customer_rolling_spend(sf_dir: str):
    """Trailing-rows window frames (ROWS BETWEEN 4 PRECEDING AND CURRENT
    ROW) in one pass: per customer ordered by (o_orderdate, o_orderkey),
    the rolling 5-order spend sum/avg/min/max/count in exact integer
    cents — the moving-average family SQL engines take for granted."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from etl_framework_ray.stages.analytic import (
        rolling_avg,
        rolling_count,
        rolling_max,
        rolling_min,
        rolling_sum,
        window,
    )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100.0), 0), pa.int64())
        return batch.drop_columns(["o_totalprice"]).append_column("price_cents", c)

    out = window(
        ds.map_batches(cents, batch_format="pyarrow"),
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
        [
            rolling_sum("price_cents", 5, "spend_5"),
            rolling_avg("price_cents", 5, "avg_5"),
            rolling_min("price_cents", 5, "min_5"),
            rolling_max("price_cents", 5, "max_5"),
            rolling_count("price_cents", 5, "n_5"),
        ],
    )

    def snap(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("avg_5")
        v = pc.divide(
            pc.cast(pc.round(pc.multiply(batch.column("avg_5"), 1e6), 0), pa.int64()),
            pa.scalar(1e6),
        )
        return batch.set_column(i, "avg_5", v)

    return out.map_batches(snap, batch_format="pyarrow")


def _q_turn_gaps(sf_dir: str):
    """Window functions over the ENGINE's committed snapshot: per
    conversation (ordered by turn_idx) — sequence position, previous
    role, and the turn_idx gap left by deletes. Composes the CDC lake
    with the analytic stage."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.stages.analytic import lag, row_number, window

    sf = _sf_name(sf_dir)
    clog = ChangeLog(_ensure_changelog(sf))
    lake = tempfile.mkdtemp(prefix=f"etl_lake_gaps_{sf}_")
    eng = CDCEngine(os.path.join(lake, "transcripts"), num_partitions=32)
    eng.replay(clog, segments_per_epoch=2)
    snap = eng.snapshot(columns=["conv_id", "turn_idx", "role"])
    out = window(
        snap,
        "conv_id",
        ["turn_idx"],
        [row_number("turn_seq"), lag("role", "prev_role"), lag("turn_idx", "prev_idx")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        g = pc.subtract(
            batch.column("turn_idx").cast(pa.int64()),
            batch.column("prev_idx").cast(pa.int64()),
        )
        return batch.drop_columns(["prev_idx"]).append_column("idx_gap", g)

    return out.map_batches(finish, batch_format="pyarrow")


def _q_user_event_type_pivot(sf_dir: str):
    """Event log → per-user feature row: one count column per event
    type (stages/pivot.py — combiner pre-aggregate, narrow partials on
    the direct exchange, wide reshape per bucket)."""
    import ray.data

    from etl_framework_ray.stages.pivot import pivot

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )
    return pivot(
        ds,
        "user_id",
        "event_type",
        agg="count",
        pivot_values=["click", "error", "purchase", "signup", "view"],
    )


def _q_heavy_hitter_events(sf_dir: str):
    """Top event types by count via the Misra–Gries / SpaceSaving
    mergeable summary (tree-merged counter sets; values never shuffle).
    capacity=64 ≥ the column's distinct count, so the sketch degrades to
    EXACT (max_undercount 0) and hash-compares against plain SQL."""
    import ray.data

    from etl_framework_ray.stages.sketches import top_frequent

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type"]
    )
    t = top_frequent(ds, "event_type", k=3, capacity=64)
    return t.select(["event_type", "est_count"]).rename_columns(["event_type", "cnt"])


def _q_order_vs_ship_by_date(sf_dir: str):
    """FULL OUTER equi-join of two distributed pre-aggregates: daily
    order counts vs daily shipment counts — dates present on only one
    side survive with nulls (ship dates extend past order dates by
    construction). Combiner-style: each block pre-counts locally, only
    (date, partial) rows shuffle."""
    import pyarrow as pa
    import ray.data

    from etl_framework_ray.stages.joins import _direct_grouped_apply, equi_join

    def counted(path: str, col: str, out: str):
        ds = ray.data.read_parquet(os.path.join(sf_dir, path), columns=[col])

        def partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by(col).aggregate([(col, "count")])
            return pa.table(
                {"d": g.column(col), out: g.column(f"{col}_count").cast(pa.int64())}
            )

        def total(df) -> pa.Table:
            s = df.groupby("d", sort=False)[out].sum().reset_index()
            return pa.table(
                {
                    "d": pa.Array.from_pandas(s["d"], type=pa.timestamp("us")),
                    out: pa.Array.from_pandas(s[out], type=pa.int64()),
                }
            )

        return _direct_grouped_apply(
            ds.map_batches(partial, batch_format="pyarrow"), "d", total
        )

    return equi_join(
        counted("orders.parquet", "o_orderdate", "n_orders"),
        counted("lineitem.parquet", "l_shipdate", "n_ships"),
        left_on="d",
        right_on="d",
        right_cols=["n_ships"],
        how="outer",
    )


def _turn_gaps_oracle_sql(sf_name: str) -> str:
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    return f"""
        WITH ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM read_parquet('{glob}')
        ), snap AS (
            SELECT conv_id, turn_idx, role
            FROM ranked WHERE rn = 1 AND op <> 'D'
        )
        SELECT conv_id, turn_idx, role,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS turn_seq,
               LAG(role, 1) OVER w AS prev_role,
               CAST(turn_idx AS BIGINT) - CAST(LAG(turn_idx, 1) OVER w AS BIGINT)
                   AS idx_gap
        FROM snap
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    """


def _bm25_oracle_sql(
    doc_sql: str = "SELECT doc_id AS id, text AS body FROM documents",
    id_col: str = "doc_id",
    bm_queries: dict | None = None,
    k: int | None = None,
) -> str:
    """One BM25 oracle shared by ALL the engine's tiers over a pluggable
    document source (scores are identical across tiers by construction —
    stages/search.py). ``doc_sql`` must yield ``(id, body)``; the CDC
    variant passes the assemble CTE so the incremental index's composed
    semantics (string_agg → tokenize → BM25) are checked end-to-end.
    Expression trees mirror the numpy kernels exactly; scores snap via
    the repo's int64-round-trip BEFORE ranking, so ordering and
    value-hash match bit-for-bit."""
    from etl_framework_ray.functions.text import TOKEN_PATTERN
    from etl_framework_ray.stages.search import DEFAULT_B, DEFAULT_K1

    bm_queries = bm_queries if bm_queries is not None else _BM25_QUERIES
    k = k if k is not None else _BM25_K
    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}')"
        for qid, terms in sorted(bm_queries.items())
        for t in sorted(set(terms))
    )
    terms_in = ", ".join(sorted({f"'{t}'" for ts in bm_queries.values() for t in ts}))
    return f"""
        WITH src AS (
            {doc_sql}
        ), docs AS (
            SELECT id,
                   regexp_extract_all(lower(COALESCE(body, '')), '{TOKEN_PATTERN}') AS toks
            FROM src
        ), dl AS (
            SELECT id, len(toks) AS dl FROM docs
        ), stats AS (
            SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
        ), q(query_id, term) AS (
            VALUES {vals}
        ), tf AS (
            SELECT id, term, COUNT(*) AS tf
            FROM (SELECT id, UNNEST(toks) AS term FROM docs)
            WHERE term IN ({terms_in})
            GROUP BY id, term
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), scored AS (
            SELECT q.query_id, tf.id,
                   SUM(
                       ln(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * ({DEFAULT_K1} + 1.0)
                       / (tf.tf + {DEFAULT_K1} * (1.0 - {DEFAULT_B}
                              + {DEFAULT_B} * dl.dl / (SELECT avgdl FROM stats)))
                   ) AS raw
            FROM q
            JOIN tf ON tf.term = q.term
            JOIN df ON df.term = q.term
            JOIN dl ON dl.id = tf.id
            GROUP BY q.query_id, tf.id
        )
        SELECT query_id, id AS {id_col},
               CAST(ROUND(raw * 1000000) AS BIGINT) / 1000000.0 AS score
        FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY CAST(ROUND(raw * 1000000) AS BIGINT) / 1000000.0 DESC, id
        ) <= {k}"""


def _bm25_cdc_oracle_sql(sf_name: str) -> str:
    """The incremental text index's composed oracle: assemble dialogues
    from the LWW-resolved changelog (the same string_agg CTE every
    corpus-view oracle uses), then BM25 over them."""
    glob = os.path.join(_changelog_dir(sf_name), "segment-*.parquet")
    doc_sql = f"""SELECT conv_id AS id,
                   string_agg(COALESCE(role, '') || ': ' || COALESCE(text, ''),
                              chr(10) ORDER BY turn_idx) AS body
            FROM (
                SELECT conv_id, turn_idx, role, text,
                       ROW_NUMBER() OVER (
                           PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
                       ) AS rn, op
                FROM read_parquet('{glob}')
            ) WHERE rn = 1 AND op <> 'D'
            GROUP BY conv_id"""
    return _bm25_oracle_sql(
        doc_sql, id_col="conv_id", bm_queries=_BM25_CDC_QUERIES, k=_BM25_K
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from etl_framework_ray.pipelines import medallion as m

    return {
        # CDC engine (the north-star pipeline)
        "cdc_replay": _cdc_replay,
        "cdc_patch_replay": _cdc_patch_replay,
        "cdc_predicate_dml": _cdc_predicate_dml,
        "cdc_purge": _cdc_purge,
        "cdc_version_diff": _cdc_version_diff,
        "cdc_snapshot_pruned": _cdc_snapshot_pruned,
        "cdc_scd2_history": _cdc_scd2_history,
        "cdc_scd2_asof": _cdc_scd2_asof,
        "cdc_rollup": _cdc_rollup,
        "cdc_rollup_incremental": _cdc_rollup_incremental,
        "cdc_stats_incremental": _cdc_stats_incremental,
        "cdc_changefeed": _cdc_changefeed,
        "cdc_corpus_incremental": _cdc_corpus_incremental,
        "cdc_dedup_incremental": _cdc_dedup_incremental,
        "cdc_minhash_incremental": _cdc_minhash_incremental,
        "cdc_curation_incremental": _cdc_curation_incremental,
        "cdc_bm25_incremental": _cdc_bm25_incremental,
        "cdc_vector_search": _cdc_vector_search,
        "cdc_window_incremental": _cdc_window_incremental,
        "cdc_role_rollup_sets": _cdc_role_rollup_sets,
        "cdc_role_rollup_incremental": _cdc_role_rollup_incremental,
        "cdc_view_changes": _cdc_view_changes,
        "cdc_replica": _cdc_replica,
        "cdc_tool_usage_incremental": _cdc_tool_usage_incremental,
        "cdc_join_incremental": _cdc_join_incremental,
        "cdc_multisource_replay": _cdc_multisource_replay,
        # reference operator parity (SURVEY.md §2)
        "clean_orders": m.clean_orders,
        "clean_parts": m.clean_parts,
        "supplier_star_join": m.supplier_nation_region,
        "revenue_by_brand": m.revenue_by_brand,
        "revenue_by_mktsegment": m.revenue_by_mktsegment,
        "shipping_priority": m.shipping_priority,
        "segment_order_coverage": m.segment_order_coverage,
        "events_props_k": m.events_props_k,
        "pricing_summary": m.pricing_summary,
        "pricing_rollup": m.pricing_rollup,
        "lineitem_price_stats": m.lineitem_price_stats,
        "forecast_revenue": m.forecast_revenue,
        "late_shipment_priority": m.late_shipment_priority,
        "promo_revenue": m.promo_revenue,
        "events_timeliness": m.events_timeliness,
        "distinct_order_status": m.distinct_order_status,
        "lineitem_pk_dups": m.lineitem_pk_dups,
        "top_orders": m.top_orders,
        "latest_event_per_user": m.latest_event_per_user,
        "tumbling_counts": _q_tumbling,
        "hopping_counts": _q_hopping,
        "session_windows": _q_sessions,
        "events_last_order": _q_events_last_order,
        "orders_7d_by_event": _q_orders_7d_by_event,
        # analytic (window) functions — stages/analytic.py
        "event_gaps": _q_event_gaps,
        "customer_order_ranks": _q_customer_order_ranks,
        "customer_rolling_spend": _q_customer_rolling_spend,
        "global_quantity_ranks": _q_global_quantity_ranks,
        "turn_gaps": _q_turn_gaps,
        "order_vs_ship_by_date": _q_order_vs_ship_by_date,
        "heavy_hitter_events": _q_heavy_hitter_events,
        "user_event_type_pivot": _q_user_event_type_pivot,
        # training-data extensions
        "text_stats": _q_text_stats,
        "top_tokens": _q_top_tokens,
        "normalize_text": _q_normalize_text,
        "redact_pii": _q_redact_pii,
        "decontaminate_docs": _q_decontaminate,
        "approx_distinct_users": _q_approx_distinct_users,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "top_events_per_user": _q_top_events_per_user,
        "price_quantiles": _q_price_quantiles,
        "price_quantiles_approx": _q_price_quantiles_approx,
        "doc_chunks_packed": _q_doc_chunks_packed,
        "uniform_sample_orders": _q_uniform_sample_orders,
        "sample_events_per_user": _q_sample_events_per_user,
        "sample_docs_10pct": _q_sample_docs,
        "exact_dedup_docs": _q_exact_dedup,
        "embedding_dedup": _q_embedding_dedup,
        "embedding_dedup_lsh": _q_embedding_dedup_lsh,
        "semantic_dedup": _q_semantic_dedup,
        "ann_topk": _q_ann_topk,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "ngram_jaccard_dedup": _q_ngram_jaccard_dedup,
        "langid": _q_langid,
        "quality_score": _q_quality_score,
        "fingerprint": _q_fingerprint,
        "repetition_stats": _q_repetition_stats,
        "stratified_sample_docs": _q_stratified_sample,
        "assemble_conversations": _q_assemble_conversations,
        "conversation_windows": _q_conversation_windows,
        "tool_usage": _q_tool_usage,
        "cluster_embeddings": _q_cluster_embeddings,
        "events_value_quantiles": _q_grouped_quantiles,
        "bloom_semijoin_lineitem": _q_bloom_semijoin,
        "pretraining_corpus": _q_pretraining_corpus,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "multimodal_decode": _q_multimodal_decode,
        "multimodal_audio": _q_multimodal_audio,
        "multimodal_frames": _q_multimodal_frames,
        "curate_documents": _q_curate_documents,
        "similar_docs": _q_similar_docs,
        "lm_perplexity_docs": _q_lm_perplexity,
        "revenue_by_mktsegment_bucketed": _q_revenue_bucketed,
        "lineitem_unpivot": _q_lineitem_unpivot,
        "events_except_all": _q_events_except_all,
        "bm25_topk_docs": _q_bm25_topk,
        "bm25_search_docs": _q_bm25_search,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query. Column names and
    float rounding match the Ray pipelines exactly. Non-SQL-expressible
    ops (LSH/minhash/simhash clustering, heuristic scoring, approximate
    ANN, stubbed multimodal decode) are intentionally omitted → the driver
    records rows-only checks for them."""
    # the changelog parquet the oracle reads is (re)generated when
    # queries() runs; ensure it exists even if the oracle runs first
    for sf in _CDC_SIZES:
        try:
            _ensure_changelog(sf)
            _ensure_patch_changelog(sf)
        except Exception:
            pass
    # driver's correctness tier; GRAFT_ORACLE_SF lets local tooling align
    # the cdc oracles when checking other tiers (tools/check_correctness)
    sf = os.environ.get("GRAFT_ORACLE_SF", "sf0.01")
    if sf not in _CDC_SIZES:
        sf = "sf0.01"
    from etl_framework_ray.functions.text import PII_PATTERNS, TOKEN_PATTERN

    # redact_pii oracle: nest regexp_replace in PII_PATTERNS order over the
    # SAME deterministic PII-suffixed text the Ray query builds — both
    # engines run RE2, so this is byte-parity, not merely equivalent.
    redacted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@mail.example.com or +1 555-123-4567 ip 10.0.'"
        " || CAST(doc_id & 255 AS VARCHAR) || '.7 ssn 123-45-6789'"
    )
    for _pat, _rep in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{_pat}', '{_rep}', 'g')"

    return {
        "cdc_replay": _cdc_oracle_sql(sf),
        "cdc_patch_replay": _cdc_patch_oracle_sql(sf),
        "cdc_predicate_dml": _cdc_predicate_dml_oracle_sql(sf),
        "cdc_purge": _cdc_purge_oracle_sql(sf),
        "cdc_window_incremental": _cdc_window_incremental_oracle_sql(sf),
        "cdc_version_diff": _cdc_version_diff_oracle_sql(sf),
        "cdc_snapshot_pruned": _cdc_pruned_oracle_sql(sf),
        "cdc_scd2_history": _scd2_history_oracle_sql(sf),
        "cdc_scd2_asof": _scd2_asof_oracle_sql(sf),
        "cdc_rollup": _cdc_rollup_oracle_sql(sf),
        "cdc_rollup_incremental": _cdc_rollup_oracle_sql(sf),
        "cdc_stats_incremental": _cdc_stats_oracle_sql(sf),
        "cdc_changefeed": _cdc_changefeed_oracle_sql(sf),
        "assemble_conversations": _assemble_oracle_sql(sf),
        "cdc_corpus_incremental": _assemble_oracle_sql(sf),
        "cdc_dedup_incremental": _dedup_labels_oracle_sql(sf),
        "cdc_minhash_incremental": _minhash_invariant_oracle_sql(sf),
        "cdc_vector_search": _vector_search_oracle_sql(sf),
        "cdc_curation_incremental": _curation_oracle_sql(sf),
        "cdc_bm25_incremental": _bm25_cdc_oracle_sql(sf),
        "cdc_role_rollup_sets": _cdc_role_rollup_sets_oracle_sql(sf),
        "cdc_role_rollup_incremental": _cdc_role_rollup_sets_oracle_sql(sf),
        "cdc_view_changes": _view_changes_oracle_sql(sf),
        "cdc_replica": _cdc_rollup_oracle_sql(sf),
        "cdc_tool_usage_incremental": _tool_usage_view_oracle_sql(sf),
        "cdc_join_incremental": _cdc_join_oracle_sql(sf),
        "cdc_multisource_replay": _cdc_multisource_oracle_sql(sf),
        "conversation_windows": _windows_oracle_sql(sf),
        "tool_usage": _tool_usage_oracle_sql(sf),
        "turn_gaps": _turn_gaps_oracle_sql(sf),
        "event_gaps": """
            SELECT user_id, event_id, ts,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
                   epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "customer_order_ranks": """
            SELECT o_orderkey, o_custkey, o_orderdate,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
                   CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
                        AS BIGINT) AS date_rank,
                   LEAD(o_orderdate, 1) OVER w AS next_order_date,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS spend_to_date_cents,
                   CAST(NTILE(4) OVER w AS BIGINT) AS time_quartile,
                   PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
                       AS date_pct_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
        "customer_rolling_spend": """
            WITH c AS (
                SELECT o_orderkey, o_custkey, o_orderdate,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
                FROM orders
            )
            SELECT o_orderkey, o_custkey, o_orderdate, price_cents,
                   SUM(price_cents) OVER w5 AS spend_5,
                   CAST(ROUND(AVG(price_cents) OVER w5 * 1000000) AS BIGINT)
                       / 1000000.0 AS avg_5,
                   MIN(price_cents) OVER w5 AS min_5,
                   MAX(price_cents) OVER w5 AS max_5,
                   CAST(COUNT(price_cents) OVER w5 AS BIGINT) AS n_5
            FROM c
            WINDOW w5 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
        "global_quantity_ranks": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   CAST(ROW_NUMBER() OVER (ORDER BY l_quantity DESC NULLS LAST,
                                           l_orderkey, l_linenumber) AS BIGINT)
                       AS row_number,
                   CAST(RANK() OVER (ORDER BY l_quantity DESC NULLS LAST)
                        AS BIGINT) AS rank,
                   CAST(DENSE_RANK() OVER (ORDER BY l_quantity DESC NULLS LAST)
                        AS BIGINT) AS dense_rank
            FROM lineitem""",
        "heavy_hitter_events": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
            ORDER BY cnt DESC, event_type LIMIT 3""",
        "user_event_type_pivot": """
            SELECT user_id,
                   CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
                   CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
                   CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
                   CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
                   CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id""",
        "order_vs_ship_by_date": """
            WITH lo AS (
                SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n_orders
                FROM orders GROUP BY 1
            ), ls AS (
                SELECT l_shipdate AS d, CAST(COUNT(*) AS BIGINT) AS n_ships
                FROM lineitem GROUP BY 1
            )
            SELECT COALESCE(lo.d, ls.d) AS d, lo.n_orders, ls.n_ships AS r_n_ships
            FROM lo FULL OUTER JOIN ls ON lo.d = ls.d""",
        "repetition_stats": """
            WITH w AS (
                SELECT doc_id, str_split(COALESCE(text, ''), ' ') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id, ws,
                       CASE WHEN len(ws) >= 3 THEN
                           list_transform(generate_series(1, len(ws) - 2),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                       ELSE [] END AS gs
                FROM w
            )
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(ROUND(1000000.0 * (len(ws) - len(list_distinct(ws)))
                        / len(ws)) AS BIGINT) / 1000000.0 AS dup_word_frac,
                   CASE WHEN len(gs) = 0 THEN 0.0 ELSE
                       CAST(ROUND(1000000.0 * (len(gs) - len(list_distinct(gs)))
                            / len(gs)) AS BIGINT) / 1000000.0
                   END AS dup_3gram_frac
            FROM g""",
        "stratified_sample_docs": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id % 100 < CASE lang
                WHEN 'en' THEN 25 WHEN 'zh' THEN 80 WHEN 'es' THEN 60
                ELSE 50 END""",
        "events_value_quantiles": """
            WITH s AS (
                SELECT event_type, value AS v,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type ORDER BY value
                       ) - 1 AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS c
                FROM events
            )
            SELECT s.event_type, CAST(t.q AS DOUBLE) AS q, s.v
            FROM (VALUES (0.5), (0.9), (0.99)) t(q)
            JOIN s ON s.rn = CAST(FLOOR(t.q * (s.c - 1)) AS BIGINT)""",
        "bloom_semijoin_lineitem": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
            GROUP BY l_returnflag""",
        "clean_orders": """
            SELECT o_orderkey, CAST(o_custkey AS INTEGER) AS o_custkey,
                   o_orderstatus AS order_status, o_totalprice,
                   o_orderpriority AS order_priority
            FROM orders""",
        "clean_parts": """
            SELECT p_partkey, p_name, p_type, CAST(p_size AS BIGINT) AS p_size
            FROM part WHERE regexp_matches(p_type, '^PROMO')""",
        "supplier_star_join": """
            SELECT s_suppkey, s_name, n_name AS nation_name, r_name AS region_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey""",
        "revenue_by_brand": """
            SELECT p_brand,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) / 100.0
                       AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand""",
        "revenue_by_mktsegment": """
            SELECT c_mktsegment,
                   CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) / 100.0 AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "revenue_by_mktsegment_bucketed": """
            SELECT c_mktsegment,
                   CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) / 100.0 AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) / 100.0
                       AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey DESC LIMIT 10""",
        "segment_order_coverage": """
            SELECT c_mktsegment,
                   CAST(SUM(CASE WHEN o.o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_orders,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM (SELECT * FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1995-06-01') o
            RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c_mktsegment""",
        "events_props_k": """
            SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) / 100.0 AS sum_value
            FROM events GROUP BY 1""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) / 100.0 AS sum_qty,
                   CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) / 100.0 AS sum_base_price,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) / 100.0
                       AS sum_disc_price,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "forecast_revenue": """
            SELECT CAST(ROUND(SUM(l_extendedprice * l_discount) * 100) AS BIGINT)
                       / 100.0 AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24""",
        "late_shipment_priority": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late FROM (
                SELECT DISTINCT o_orderkey, o_orderpriority
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1997-01-01'
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            ) GROUP BY o_orderpriority""",
        "promo_revenue": """
            SELECT CAST(ROUND(
                       100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END)
                       / SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                       / 100.0 AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'""",
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id,
                   CAST(COUNT(*) AS BIGINT) AS count_order,
                   CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) / 100.0 AS sum_qty,
                   CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) / 100.0 AS sum_base_price,
                   CAST(ROUND(AVG(l_extendedprice) * 100) AS BIGINT) / 100.0 AS avg_price
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
        "lineitem_price_stats": """
            SELECT l_returnflag,
                   CAST(COUNT(l_extendedprice) AS BIGINT) AS n_price,
                   CAST(ROUND(var_samp(l_extendedprice) * 100) AS BIGINT) / 100.0 AS var_price,
                   CAST(ROUND(stddev_samp(l_extendedprice) * 100) AS BIGINT) / 100.0 AS std_price,
                   CAST(ROUND(var_pop(l_quantity) * 100) AS BIGINT) / 100.0 AS varp_qty
            FROM lineitem GROUP BY l_returnflag""",
        "events_timeliness": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) < 9 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_before_9
            FROM events GROUP BY event_type""",
        "distinct_order_status": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders""",
        "lineitem_pk_dups": """
            SELECT l_orderkey, l_linenumber, CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1""",
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10""",
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, event_type, value FROM (
                SELECT user_id, event_id, ts, event_type, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
            WHERE rn = 1""",
        "tumbling_counts": """
            SELECT event_type,
                   to_timestamp(CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600)::TIMESTAMP
                       AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) / 100.0 AS sum_value
            FROM events GROUP BY 1, 2""",
        "hopping_counts": """
            WITH hops AS (
                SELECT event_type, value,
                       (CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900 - k.k * 900) AS ws
                FROM events, (SELECT UNNEST(range(0, 4)) AS k) k
            )
            SELECT event_type,
                   to_timestamp(ws)::TIMESTAMP AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) / 100.0 AS sum_value
            FROM hops GROUP BY 1, 2""",
        "events_last_order": """
            WITH ded AS (
                SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS od,
                       MAX(o_orderkey) AS o_orderkey
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id,
                   CAST(d.o_orderkey AS DOUBLE) AS last_order_key
            FROM events e ASOF LEFT JOIN ded d
              ON e.user_id = d.o_custkey AND e.ts >= d.od""",
        "orders_7d_by_event": """
            SELECT e.event_id, e.user_id,
                   CAST(COUNT(o.o_orderdate) AS BIGINT) AS n_orders_7d,
                   CAST(ROUND(COALESCE(SUM(o.o_totalprice), 0) * 100) AS BIGINT) / 100.0
                       AS total_7d
            FROM events e LEFT JOIN orders o
              ON e.user_id = o.o_custkey
             AND o.o_orderdate > e.ts - INTERVAL 7 DAY
             AND o.o_orderdate <= e.ts
            GROUP BY 1, 2""",
        "session_windows": """
            WITH gaps AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN epoch(ts - LAG(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM gaps
            )
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, session_id""",
        "text_stats": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_actual,
                   CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
                       AS n_bpe_tokens,
                   CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha
            FROM documents""",
        "top_events_per_user": """
            SELECT user_id, event_id, value FROM (
                SELECT user_id, event_id, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY value DESC, event_id ASC
                       ) AS rn
                FROM events
            ) WHERE rn <= 3""",
        "normalize_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),
                                       '\s+', ' ', 'g')) AS text
            FROM documents""",
        "redact_pii": f"""
            SELECT doc_id, {redacted} AS text FROM documents""",
        "quality_score": _quality_score_oracle_sql(),
        "langid": _langid_oracle_sql(),
        "lm_perplexity_docs": _lm_perplexity_oracle_sql(),
        "decontaminate_docs": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id, array_to_string(t[i : i + 7], ' ') AS shingle
                FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
            ), bench AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0
            ), hit AS (
                SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle)
                WHERE s.doc_id % 20 <> 0
            )
            SELECT doc_id FROM documents
            WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)""",
        "uniform_sample_orders": _q_uniform_sample_orders,
        "sample_events_per_user": _q_sample_events_per_user,
        "sample_docs_10pct": """
            SELECT doc_id, n_chars FROM documents WHERE doc_id % 100 < 10""",
        "price_quantiles": """
            WITH s AS (
                SELECT l_extendedprice AS v,
                       ROW_NUMBER() OVER (ORDER BY l_extendedprice) - 1 AS rn
                FROM lineitem
            ), n AS (SELECT COUNT(*) AS c FROM lineitem)
            SELECT CAST(t.q AS DOUBLE) AS q, s.v
            FROM (VALUES (0.5), (0.9), (0.99)) t(q)
            JOIN s ON s.rn = CAST(FLOOR(t.q * ((SELECT c FROM n) - 1)) AS BIGINT)""",
        "events_except_all": """
            SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
            EXCEPT ALL
            SELECT user_id, event_type FROM events WHERE event_id % 2 = 1""",
        "lineitem_unpivot": """
            SELECT l_orderkey, l_linenumber, name, value
            FROM (SELECT l_orderkey, l_linenumber,
                         l_quantity, l_extendedprice, l_discount, l_tax
                  FROM lineitem)
            UNPIVOT (value FOR name IN
                     (l_quantity, l_extendedprice, l_discount, l_tax))""",
        "uniform_sample_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':7') LIMIT 1000""",
        "sample_events_per_user": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id
                           ORDER BY md5(CAST(event_id AS VARCHAR) || ':11')
                       ) AS rn
                FROM events) WHERE rn <= 3""",
        "similar_docs": """
            WITH docs AS (
                SELECT doc_id, lower(text) AS s FROM documents
                WHERE length(text) >= 3 AND doc_id < 500
            ), tri AS (
                SELECT DISTINCT doc_id, tok FROM (
                    SELECT doc_id,
                           UNNEST([substr(s, i, 3) FOR i IN range(1, length(s) - 1)]) AS tok
                    FROM docs)
            ), sz AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM tri a JOIN tri b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b,
                   CAST(ROUND(c * 1.0 / (sa.sz + sb.sz - c) * 1000000) AS BIGINT)
                       / 1000000.0 AS sim
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
            WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.7""",
        "bm25_topk_docs": _bm25_oracle_sql(),
        "bm25_search_docs": _bm25_oracle_sql(),
        "top_tokens": f"""
            WITH toks AS (
                SELECT UNNEST(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
                FROM documents
            )
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM toks GROUP BY 1
            ORDER BY n DESC, token ASC LIMIT 100""",
        "exact_dedup_docs": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text""",
        "embedding_dedup": """
            SELECT a.vec_id,
                   COALESCE(BOOL_OR(
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) >= 0.95),
                            FALSE) AS is_dup
            FROM embeddings a LEFT JOIN embeddings b ON b.vec_id < a.vec_id
            GROUP BY a.vec_id""",
        "ann_topk": """
            SELECT q.vec_id AS query_id, t.vec_id,
                   CAST(ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(t.embedding AS DOUBLE[])) * 10000)
                        AS BIGINT) / 10000.0 AS sim
            FROM embeddings q CROSS JOIN embeddings t
            WHERE q.vec_id IN (0, 1, 2, 3, 4) AND t.vec_id <> q.vec_id
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                CAST(t.embedding AS DOUBLE[])) DESC,
                         t.vec_id) <= 5""",
    }
