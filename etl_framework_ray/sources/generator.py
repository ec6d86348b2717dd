"""Deterministic synthetic transcript changelog generator + oracle replay.

Generates the FIXTURES.md F2 change-event log (full row images) over
conversations shaped per the input hint
``(conv_id, turn_idx, role, text, tool, ts)``. Fully seeded and vectorized
(numpy); no wall-clock. Modes (FIXTURES.md F2): uniform, hot-key skew,
duplicate delivery, out-of-order within segments.

The oracle (FIXTURES.md F3) is a plain-Python dict replay in ``(ts, lsn)``
order — the ground truth every end-to-end test compares the committed lake
state against (per-turn text equality under stable turn ordering).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

_EPOCH_START_US = 1_700_000_000_000_000  # fixed base timestamp (us), no wall clock

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator"])

CHANGELOG_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),  # I | U | D
        pa.field("ts", pa.timestamp("us"), nullable=False),
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("tool", pa.string()),
    ]
)


@dataclass(frozen=True)
class GenConfig:
    num_events: int = 10_000
    num_conversations: int = 200
    max_turns: int = 16
    seed: int = 42
    delete_frac: float = 0.05
    #: fraction of events forced onto conversation 0 (hot-key skew mode);
    #: 0.0 = uniform
    hot_key_frac: float = 0.0
    #: turn-index range for the hot conversation (None → same as max_turns).
    #: A hot conversation with MANY turns produces residual post-combiner
    #: skew (many distinct keys on one partition), the case detect_skew
    #: exists for; a hot conversation with few turns is absorbed by the
    #: LWW combiner entirely.
    hot_max_turns: int | None = None
    #: shuffle row order within windows of this many rows (out-of-order mode,
    #: FIXTURES.md F2d: out-of-order WITHIN a segment — real binlog readers
    #: see bounded reordering, not arbitrary global shuffles, so keep the
    #: window ≤ segment_rows and aligned to it). False/0 disables.
    out_of_order: bool = False
    out_of_order_window: int = 100
    #: ts advances once every this many LSNs → (ts, lsn) ties broken by lsn
    ts_tie_every: int = 4
    #: approximate extra payload characters appended to each text
    text_pad: int = 96
    #: first LSN (> 0); lets callers generate a long log in chunks
    lsn_start: int = 1
    #: fraction of UPDATE events emitted as PARTIAL row images (op="P"):
    #: only the changed payload columns are set, the rest are NULL
    #: (NULL means "unchanged" — a patch can never set NULL; use a full
    #: U for that). Mirrors Debezium/Mongo patch-style updates.
    patch_frac: float = 0.0


def generate_changelog(cfg: GenConfig) -> pa.Table:
    """Vectorized change-event log. LSNs are 1..N, globally monotone."""
    n = cfg.num_events
    rng = np.random.default_rng(cfg.seed)

    lsn = np.arange(cfg.lsn_start, cfg.lsn_start + n, dtype=np.int64)
    conv = rng.integers(0, cfg.num_conversations, n)
    if cfg.hot_key_frac > 0:
        hot = rng.random(n) < cfg.hot_key_frac
        conv[hot] = 0
    turn = rng.integers(0, cfg.max_turns, n).astype(np.int32)
    if cfg.hot_key_frac > 0 and cfg.hot_max_turns:
        is_hot = conv == 0
        turn[is_hot] = rng.integers(0, cfg.hot_max_turns, int(is_hot.sum())).astype(np.int32)
    is_del = rng.random(n) < cfg.delete_frac

    ts_us = _EPOCH_START_US + (lsn // cfg.ts_tie_every) * 1_000_000

    # first occurrence of a key in LSN order is an insert, later ones updates
    # (LWW applies I and U identically; the op tag mirrors binlog shape)
    key = conv.astype(np.int64) * np.int64(1 << 32) + turn.astype(np.int64)
    _, first_idx = np.unique(key, return_index=True)
    is_first = np.zeros(n, dtype=bool)
    is_first[first_idx] = True
    op = np.where(is_del, "D", np.where(is_first, "I", "U")).astype(object)

    conv_id = np.char.add("conv-", np.char.zfill(conv.astype("U8"), 6)).astype(object)
    role = ROLES[turn % len(ROLES)].astype(object)
    tool_choice = TOOLS[conv % len(TOOLS)].astype(object)
    has_tool = (role == "tool") | ((lsn % 7 == 0) & (role == "assistant"))
    tool = np.where(has_tool, tool_choice, None)

    pad = "x" * cfg.text_pad
    text = (
        "conv="
        + pd.Series(conv).astype(str)
        + " turn="
        + pd.Series(turn).astype(str)
        + " rev="
        + pd.Series(lsn).astype(str)
        + " "
        + pad
    ).to_numpy(dtype=object)

    # deletes carry no payload (full-row-image binlog: only key + op + ts)
    role = np.where(is_del, None, role)
    text = np.where(is_del, None, text)
    tool = np.where(is_del, None, tool)

    if cfg.patch_frac > 0:
        # partial row images: some updates carry only the changed columns.
        # kind cycles by lsn: 0 → {text}, 1 → {tool}, 2 → {text, role}
        is_patch = (op == "U") & (rng.random(n) < cfg.patch_frac)
        op = np.where(is_patch, "P", op)
        kind = lsn % 3
        ptext = (
            "patched conv="
            + pd.Series(conv).astype(str)
            + " turn="
            + pd.Series(turn).astype(str)
            + " rev="
            + pd.Series(lsn).astype(str)
            + " "
            + pad
        ).to_numpy(dtype=object)
        set_text = (kind == 0) | (kind == 2)
        set_role = kind == 2
        set_tool = kind == 1
        text = np.where(is_patch, np.where(set_text, ptext, None), text)
        role = np.where(
            is_patch,
            np.where(set_role, ROLES[(turn + 1) % len(ROLES)].astype(object), None),
            role,
        )
        tool = np.where(
            is_patch, np.where(set_tool, TOOLS[lsn % len(TOOLS)].astype(object), None), tool
        )

    order = np.arange(n)
    if cfg.out_of_order:
        w = max(2, cfg.out_of_order_window)
        for start in range(0, n, w):
            end = min(start + w, n)
            order[start:end] = rng.permutation(order[start:end])

    return pa.Table.from_arrays(
        [
            pa.array(lsn[order]),
            pa.array(op[order], pa.string()),
            pa.array(ts_us[order], pa.timestamp("us")),
            pa.array(conv_id[order], pa.string()),
            pa.array(turn[order], pa.int32()),
            pa.array(role[order], pa.string()),
            pa.array(text[order], pa.large_string()),
            pa.array(tool[order], pa.string()),
        ],
        schema=CHANGELOG_SCHEMA,
    )


#: per-conversation dimension-table changelog (state/schema.CONV_PROFILE):
#: one row per conversation, PK = (conv_id,) — the second CDC table the
#: incremental join view maintains against the transcripts fact table
PROFILE_CHANGELOG_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),  # I | U | D
        pa.field("ts", pa.timestamp("us"), nullable=False),
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("channel", pa.string()),
        pa.field("priority", pa.int32()),
    ]
)

CHANNELS = np.array(["web", "mobile", "api", "partner", "internal"])


def generate_profile_changelog(cfg: GenConfig) -> pa.Table:
    """Deterministic change-event log for the ``conv_profile`` dimension
    table, over the SAME ``conv-%06d`` id universe as
    :func:`generate_changelog` (so transcripts ⋈ profile joins are
    meaningful). One logical row per conversation (PK = conv_id); ops,
    timestamps and out-of-order windows follow the same conventions as
    the transcript log. ``cfg.max_turns``/``hot_*``/``text_pad`` are
    ignored (no turn grain, no payload text)."""
    n = cfg.num_events
    rng = np.random.default_rng(cfg.seed + 104_729)  # independent stream

    lsn = np.arange(cfg.lsn_start, cfg.lsn_start + n, dtype=np.int64)
    conv = rng.integers(0, cfg.num_conversations, n)
    is_del = rng.random(n) < cfg.delete_frac
    ts_us = _EPOCH_START_US + (lsn // cfg.ts_tie_every) * 1_000_000

    _, first_idx = np.unique(conv, return_index=True)
    is_first = np.zeros(n, dtype=bool)
    is_first[first_idx] = True
    op = np.where(is_del, "D", np.where(is_first, "I", "U")).astype(object)

    conv_id = np.char.add("conv-", np.char.zfill(conv.astype("U8"), 6)).astype(object)
    # attributes vary per EVENT (not just per conversation) so an update
    # actually changes the row — rev-keyed like the transcript text
    channel = CHANNELS[(conv.astype(np.int64) + lsn) % len(CHANNELS)].astype(object)
    priority = ((conv.astype(np.int64) * 7 + lsn) % 5).astype(np.int32)

    channel = np.where(is_del, None, channel)
    priority_valid = ~is_del

    order = np.arange(n)
    if cfg.out_of_order:
        w = max(2, cfg.out_of_order_window)
        for start in range(0, n, w):
            end = min(start + w, n)
            order[start:end] = rng.permutation(order[start:end])

    return pa.Table.from_arrays(
        [
            pa.array(lsn[order]),
            pa.array(op[order], pa.string()),
            pa.array(ts_us[order], pa.timestamp("us")),
            pa.array(conv_id[order], pa.string()),
            pa.array(channel[order], pa.string()),
            pa.array(
                np.where(priority_valid, priority, 0)[order],
                pa.int32(),
                mask=~priority_valid[order],
            ),
        ],
        schema=PROFILE_CHANGELOG_SCHEMA,
    )


def oracle_profile_replay(log: pa.Table) -> dict:
    """Dict replay of the profile changelog in (ts, lsn) order:
    ``{conv_id: {channel, priority, ts}}`` for live rows."""
    rows = log.to_pylist()
    rows.sort(key=lambda r: (r["ts"], r["lsn"]))
    state: dict = {}
    for r in rows:
        if r["op"] == "D":
            state.pop(r["conv_id"], None)
        else:
            state[r["conv_id"]] = {
                "channel": r["channel"],
                "priority": r["priority"],
                "ts": r["ts"],
            }
    return state


def oracle_replay(log: pa.Table, payload_cols: tuple[str, ...] = ("role", "text", "tool")) -> dict:
    """Plain-Python dict replay in (ts, lsn) order — the test oracle.

    Returns ``{(conv_id, turn_idx): {role, text, tool, ts}}`` for live rows.
    Intentionally naive (row loop) — only used on test-sized inputs.
    """
    rows = log.to_pylist()
    rows.sort(key=lambda r: (r["ts"], r["lsn"]))
    state: dict = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            state.pop(k, None)
        elif r["op"] == "P":
            # partial image: merge the set (non-NULL) columns onto the
            # current row; a patch to an absent/deleted key is discarded
            cur = state.get(k)
            if cur is not None:
                for c in payload_cols:
                    v = r.get(c)
                    if v is not None:
                        cur[c] = v
                cur["ts"] = r["ts"]
        else:
            state[k] = {c: r.get(c) for c in payload_cols} | {"ts": r["ts"]}
    return state
