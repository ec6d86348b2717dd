"""etl_framework_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference ETL
framework (Tomoscorbin/ETL-framework, surveyed in /root/repo/SURVEY.md) as
idiomatic Ray Data pipelines:

- changelog (binlog/WAL) segments read as zero-copy Arrow batches
  (``sources/changelog.py``),
- hash-partitioned by ``conv_id`` with a vectorized last-writer-wins (LWW)
  pre-reduce combiner (``stages/lww.py``),
- applied by per-partition copy-on-write merges against existing Parquet
  row groups (``pipelines/cdc.py``),
- committed exactly-once through an atomic per-table manifest with
  per-partition applied-LSN watermarks (``state/manifest.py``),
- with diff-based schema evolution (``state/schema.py``, ``state/planner.py``
  — port of the reference's snapshot→plan→validate→execute semantics,
  /root/reference/src/delta_engine/orchestrate/orchestrator.py:51-91),
- data-quality gates that warn or abort writes (``functions/quality.py`` —
  /root/reference/src/models/data_quality_evaluator.py:81-102 semantics),
- and lineage/metrics audit tables (``pipelines/metrics.py`` —
  generalizing /root/reference/src/metadata/slo/*).

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (tests, bench.py, or the driver).
"""

__version__ = "0.1.0"
