"""Generator determinism + fixture-mode tests (sources/generator.py). No Ray."""

from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


def test_deterministic():
    a = generate_changelog(GenConfig(num_events=2000, seed=7))
    b = generate_changelog(GenConfig(num_events=2000, seed=7))
    assert a.equals(b)
    c = generate_changelog(GenConfig(num_events=2000, seed=8))
    assert not a.equals(c)


def test_schema_and_ops():
    t = generate_changelog(GenConfig(num_events=5000, seed=42, delete_frac=0.1))
    assert t.column_names == ["lsn", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
    ops = set(t.column("op").to_pylist())
    assert ops == {"I", "U", "D"}
    # deletes carry no payload
    rows = t.to_pylist()
    for r in rows:
        if r["op"] == "D":
            assert r["text"] is None and r["role"] is None


def test_hot_key_skew_mode():
    t = generate_changelog(GenConfig(num_events=10000, seed=42, hot_key_frac=0.3))
    convs = t.column("conv_id").to_pylist()
    hot = sum(1 for c in convs if c == "conv-000000")
    assert hot > 2500  # ~30%+ of events on one conversation


def test_out_of_order_same_final_state():
    cfg = GenConfig(num_events=3000, seed=11)
    ordered = generate_changelog(cfg)
    shuffled = generate_changelog(GenConfig(num_events=3000, seed=11, out_of_order=True))
    assert oracle_replay(ordered) == oracle_replay(shuffled)
