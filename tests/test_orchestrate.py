"""Orchestrator / executor tests — reference style: DI fakes with
call-recording, construct-state → plan → assert, end-to-end ensure
(/root/reference/tests/delta_engine/orchestrate/test_orchestrator.py
pattern; SURVEY.md §5). Plus the bronze CSV ingest (S1)."""

import pyarrow as pa
import pytest

from etl_framework_ray.state.manifest import ManifestStore
from etl_framework_ray.state.orchestrate import (
    ActionRunner,
    CatalogReader,
    Orchestrator,
    Validator,
    discover_specs,
)
from etl_framework_ray.state.planner import ValidationError
from etl_framework_ray.state.schema import ColumnSpec, TableSpec

SPEC_V1 = TableSpec(
    name="t1",
    columns=(
        ColumnSpec("id", pa.int32(), nullable=False),
        ColumnSpec("name", pa.string()),
    ),
    primary_key=("id",),
)

SPEC_V2 = TableSpec(  # adds a column, widens id, drops name
    name="t1",
    columns=(
        ColumnSpec("id", pa.int64(), nullable=False),
        ColumnSpec("score", pa.float64()),
    ),
    primary_key=("id",),
)


def test_sync_creates_then_aligns(tmp_path):
    lake = str(tmp_path)
    orch = Orchestrator(lake)

    r1 = orch.sync([SPEC_V1])
    assert r1.applied == ["create t1"]
    state = CatalogReader(lake).snapshot(["t1"])["t1"]
    assert state.schema.names == ["id", "name"]
    assert state.primary_key == ("id",)

    r2 = orch.sync([SPEC_V1])  # idempotent: no-op plan
    assert r2.applied == []
    assert r2.plans[0].is_noop

    r3 = orch.sync([SPEC_V2])
    assert r3.applied == ["align t1"]
    state = CatalogReader(lake).snapshot(["t1"])["t1"]
    assert state.schema.names == ["id", "score"]  # name dropped, score added
    assert state.schema.field("id").type == pa.int64()  # widened
    assert state.schema.field("score").nullable
    man = ManifestStore(f"{lake}/t1").load()
    assert man.schema_version == 2
    # internal bookkeeping columns stay last in the physical schema
    assert man.schema.names[-2:] == ["_lsn", "_deleted"]


def test_validator_blocks_unsafe_plan(tmp_path):
    lake = str(tmp_path)
    orch = Orchestrator(lake)
    orch.sync([SPEC_V1])
    bad = TableSpec(  # drops the PK column "id"
        name="t1",
        columns=(ColumnSpec("name", pa.string()),),
    )
    with pytest.raises(ValidationError, match="primary key"):
        orch.sync([bad])


def test_injectable_rules_and_fakes(tmp_path):
    calls = []

    def spy_rule(spec, plan):
        calls.append(("rule", spec.name))
        return None

    class FakeRunner:
        def __init__(self):
            self.calls = []

        def apply(self, specs, plans):
            self.calls.append(("apply", [p.table for p in plans]))
            return ["fake"]

    runner = FakeRunner()
    orch = Orchestrator(
        str(tmp_path),
        validator=Validator(model_rules=[spy_rule], plan_rules=[]),
        runner=runner,
    )
    res = orch.sync([SPEC_V1])
    assert calls == [("rule", "t1")]
    assert runner.calls == [("apply", ["t1"])]
    assert res.applied == ["fake"]


def test_align_order_is_deterministic(tmp_path):
    """drop PK → add → drop → widen → nullability → add PK (reference
    align_executor.py:28-39 order) — verified via resulting state after a
    PK change + add + drop in one sync."""
    lake = str(tmp_path)
    orch = Orchestrator(lake)
    orch.sync([SPEC_V1])
    new = TableSpec(
        name="t1",
        columns=(
            ColumnSpec("id", pa.int32(), nullable=False),
            ColumnSpec("name", pa.string(), nullable=False),  # tighten nullability
            ColumnSpec("extra", pa.string()),
        ),
        primary_key=("id", "name"),  # PK change → drop+add
    )
    res = orch.sync([new])
    a = res.plans[0].align
    assert a.pk_drop is not None and a.pk_add.columns == ("id", "name")
    state = CatalogReader(lake).snapshot(["t1"])["t1"]
    assert state.primary_key == ("id", "name")
    assert not state.schema.field("name").nullable


def test_column_comments_synced(tmp_path):
    lake = str(tmp_path)
    Orchestrator(lake).sync([SPEC_V1])
    commented = TableSpec(
        name="t1",
        columns=(
            ColumnSpec("id", pa.int32(), nullable=False, comment="entity id"),
            ColumnSpec("name", pa.string()),
        ),
        primary_key=("id",),
    )
    res = Orchestrator(lake).sync([commented])
    assert res.applied == ["align t1"]
    state = CatalogReader(lake).snapshot(["t1"])["t1"]
    assert state.schema.field("id").metadata[b"comment"] == b"entity id"
    # idempotent once synced
    assert Orchestrator(lake).sync([commented]).plans[0].is_noop


def test_foreign_keys_synced_and_validated(tmp_path):
    from etl_framework_ray.state.manifest import ManifestStore
    from etl_framework_ray.state.schema import ForeignKey

    parent = TableSpec(
        name="aisles",
        columns=(ColumnSpec("aisle_id", pa.int32(), nullable=False),),
        primary_key=("aisle_id",),
    )
    child = TableSpec(
        name="products",
        columns=(
            ColumnSpec("product_id", pa.int32(), nullable=False),
            ColumnSpec("aisle_id", pa.int32(), foreign_key=ForeignKey("aisles", "aisle_id")),
        ),
        primary_key=("product_id",),
    )
    lake = str(tmp_path)
    res = Orchestrator(lake).sync([parent, child])
    assert "fks products" in res.applied
    man = ManifestStore(f"{lake}/products").load()
    fk = man.properties["foreign_keys"]["aisle_id"]
    assert fk["references"] == "aisles.aisle_id"
    assert fk["name"].startswith("fk_products_aisle_id_")
    # idempotent: second sync doesn't re-commit fks
    res2 = Orchestrator(lake).sync([parent, child])
    assert "fks products" not in res2.applied

    orphan = TableSpec(
        name="orders",
        columns=(
            ColumnSpec("order_id", pa.int32(), nullable=False),
            ColumnSpec("ghost_id", pa.int32(), foreign_key=ForeignKey("ghost", "id")),
        ),
        primary_key=("order_id",),
    )
    with pytest.raises(RuntimeError, match="ghost"):
        Orchestrator(lake).sync([orphan])


def test_discover_specs_scans_module():
    import types

    m = types.ModuleType("fake_steps")
    m.table_a = SPEC_V1
    m.other = 42
    specs = discover_specs(m)
    assert [s.name for s in specs] == ["t1"]


@pytest.mark.usefixtures("ray_session")
def test_bronze_csv_ingest(tmp_path):
    from etl_framework_ray.sources.csv import ingest_directory
    from etl_framework_ray.pipelines.cdc import CDCEngine

    src = tmp_path / "raw"
    src.mkdir()
    (src / "aisles.csv").write_text("aisle_id,aisle\n1,bakery\n2,dairy\n")
    (src / "departments.csv").write_text("department_id,department\n7,frozen\n")
    lake = str(tmp_path / "lake" / "bronze")

    specs = ingest_directory(str(src), lake)
    assert set(specs) == {"aisles", "departments"}
    assert all(c.nullable for c in specs["aisles"].columns)  # bronze: inferred, nullable
    eng = CDCEngine(f"{lake}/aisles", spec=specs["aisles"])
    rows = sorted(eng.snapshot_arrow().to_pylist(), key=lambda r: r["aisle_id"])
    assert rows == [
        {"aisle_id": 1, "aisle": "bakery"},
        {"aisle_id": 2, "aisle": "dairy"},
    ]
    # re-ingest is an idempotent refresh
    ingest_directory(str(src), lake)
    assert CDCEngine(f"{lake}/aisles", spec=specs["aisles"]).snapshot_arrow().num_rows == 2
