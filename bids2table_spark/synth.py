"""Deterministic synthetic multi-turn transcript generator.

Produces the ``input_hint`` table (conv_id, turn_idx, role, text, tool, ts,
pt) at any scale, distributed: the driver only plans ``spark.range`` over
conversation ids; per-partition expansion happens in Arrow-batched
``mapInPandas`` with all randomness derived from counter-based splitmix64
hashes of (seed, conv_id, turn_idx, field) — a pure function, so the output
is bit-identical regardless of partitioning, executor count, or run order
(north-rule determinism: no wall clock, no stateful RNG).

Shape knobs follow FIXTURES.md §A: Zipf-ish turn counts (mean ~20, max 512),
a hot ~3% of conversations carrying ~30% of turns (exercises the salting
path), ~70%-null skewed ``tool``, templated NL + JSON + unicode text, and
per-conversation second-granular monotone timestamps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, pt string"
)

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z, seconds

TOOLS = np.array(
    ["bash", "search", "edit", "read", "write", "grep", "glob",
     "fetch", "sql", "python", "browser", "diff"],
    dtype=object,
)

_WORDS = np.array(
    ("the pipeline needs a careful review of partition pruning and shuffle "
     "boundaries before we scale this job to the full table and the cost "
     "model picks dictionary or run length encoding for every column block "
     "while timestamps compress with delta frames after sorting by turn "
     "order which keeps runs long enough for the selector to matter").split(),
    dtype=object,
)

_JSON_KEYS = np.array(["cmd", "path", "query", "pattern", "url", "expr"], dtype=object)
_JSON_VALS = np.array(
    ["ls -la /data", "spark.sql.shuffle.partitions", "SELECT count(*) FROM t",
     "conv-[0-9]+", "https://example.org/api", "a+b*c"],
    dtype=object,
)
_EMOJI = np.array(["🚀", "✅", "🔥", "∑", "日本語"], dtype=object)

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized counter-based hash."""
    x = (x + _M1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _M2
    x ^= x >> np.uint64(27)
    x *= _M3
    x ^= x >> np.uint64(31)
    return x


def _uniform(conv: np.ndarray, turn: np.ndarray, tag: int, seed: int) -> np.ndarray:
    """Deterministic U[0,1) per (conv, turn, tag)."""
    key = (
        conv.astype(np.uint64) * np.uint64(0x100000001B3)
        + turn.astype(np.uint64) * np.uint64(0x1B873593)
        + np.uint64(tag * 0x85EBCA6B + seed * 0xC2B2AE35)
    )
    return _mix(key).astype(np.float64) / 18446744073709551616.0


def turns_for_conv(conv: np.ndarray, seed: int = 42) -> np.ndarray:
    """Turn count per conversation: exponential mean ~20 capped at 512, with
    a hot ~3% (conv % 100 < 3) multiplied ~10x -> ~30% of all turns."""
    u = _uniform(conv, np.zeros_like(conv), 0, seed)
    t = 1 + (-19.0 * np.log1p(-u * 0.9999)).astype(np.int64)
    hot = (conv % 100) < 3  # hot ~3% of conversations -> ~30% of turns
    t = np.where(hot, 150 + (u * 362).astype(np.int64), t)
    return np.clip(t, 1, 512)


def gen_turns(conv_ids: np.ndarray, seed: int = 42, n_pt: int = 8, n_conv_total: int | None = None) -> pd.DataFrame:
    """Expand conversation ids into the full transcript frame (vectorized)."""
    conv_ids = np.ascontiguousarray(conv_ids, dtype=np.int64)
    n_turns = turns_for_conv(conv_ids, seed)
    conv = np.repeat(conv_ids, n_turns)
    total = len(conv)
    if total == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype="object"),
                "turn_idx": pd.Series([], dtype="int32"),
                "role": pd.Series([], dtype="object"),
                "text": pd.Series([], dtype="object"),
                "tool": pd.Series([], dtype="object"),
                "ts": pd.Series([], dtype="datetime64[ns]"),
                "pt": pd.Series([], dtype="object"),
            }
        )
    # segmented turn index: 0..k-1 within each conversation
    ends = np.cumsum(n_turns)
    starts = ends - n_turns
    turn = np.arange(total, dtype=np.int64) - np.repeat(starts, n_turns)

    # roles: user/assistant alternate; some turn-0 system; occasional tool
    role = np.where(turn % 2 == 0, "user", "assistant").astype(object)
    u_sys = _uniform(conv, turn, 1, seed)
    role[(turn == 0) & (u_sys < 0.2)] = "system"
    u_tool_role = _uniform(conv, turn, 2, seed)
    tool_turn = (u_tool_role < 0.12) & (turn > 0)
    role[tool_turn] = "tool"

    # tool column: non-null for tool turns + ~20% of assistant turns, skewed
    u_pick = _uniform(conv, turn, 3, seed)
    idx = (u_pick * u_pick * len(TOOLS)).astype(np.int64)  # quadratic skew
    tool = np.full(total, None, dtype=object)
    has_tool = tool_turn | ((role == "assistant") & (_uniform(conv, turn, 4, seed) < 0.25))
    tool[has_tool] = TOOLS[idx[has_tool]]

    # text: templated NL for user/assistant/system, JSON-ish for tool turns,
    # sprinkle unicode, and occasional empty strings
    w = len(_WORDS)
    i1 = (_uniform(conv, turn, 5, seed) * w).astype(np.int64)
    ln = (2 + _uniform(conv, turn, 6, seed) * 14).astype(np.int64)  # phrase length 2..15
    # phrase = contiguous word window (repeated substrings -> FSST fodder)
    phrase1 = _phrase(i1, ln)
    phrase2 = _phrase((i1 * 7 + 13) % w, (ln % 9) + 2)
    text = (phrase1 + ". " + phrase2).astype(object)
    jk = _JSON_KEYS[(i1 % len(_JSON_KEYS))]
    jv = _JSON_VALS[((i1 + ln) % len(_JSON_VALS))]
    jstat = np.where(_uniform(conv, turn, 7, seed) < 0.9, "ok", "error").astype(object)
    jtext = '{"' + jk + '": "' + jv + '", "status": "' + jstat + '"}'
    text = np.where(role == "tool", jtext, text)
    # per-turn entropy on ~40% of turns (ids, counts) so text is not
    # trivially dict-encodable — keeps the FSST path honest at scale
    uid = _mix(conv.astype(np.uint64) * np.uint64(31) + turn.astype(np.uint64) + np.uint64(seed))
    tagged = _uniform(conv, turn, 11, seed) < 0.4
    text = np.where(
        tagged,
        text + " ref-" + np.char.mod("%012x", uid & np.uint64(0xFFFFFFFFFFFF)).astype(object),
        text,
    ).astype(object)
    emoji_turn = _uniform(conv, turn, 8, seed) < 0.02
    text = np.where(
        emoji_turn, text + " " + _EMOJI[(i1 % len(_EMOJI))], text
    ).astype(object)
    text[_uniform(conv, turn, 9, seed) < 0.005] = ""

    # ts: per-conv start + cumulative 1..300s deltas (second granularity)
    start_s = _EPOCH_2024 + (conv * 997) % (86400 * 365)
    delta_s = 1 + (_uniform(conv, turn, 10, seed) * 299).astype(np.int64)
    cum = np.cumsum(delta_s)
    seg_base = np.repeat(cum[starts] - delta_s[starts], n_turns)
    ts_s = start_s + (cum - seg_base)
    ts = (ts_s * 1_000_000_000).view("datetime64[ns]")

    n_total = int(n_conv_total) if n_conv_total else int(conv_ids.max()) + 1
    per_pt = max(1, -(-n_total // n_pt))
    pt = np.char.add("pt-", np.char.zfill((conv // per_pt).astype(str), 4)).astype(object)

    conv_str = np.char.add("conv-", np.char.zfill(conv.astype(str), 12)).astype(object)
    return pd.DataFrame(
        {
            "conv_id": conv_str,
            "turn_idx": turn.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "pt": pt,
        }
    )


def _phrase(start: np.ndarray, length: np.ndarray) -> np.ndarray:
    """Vectorized contiguous word-window join: phrase i = words[s..s+l) wrapped."""
    w = len(_WORDS)
    max_len = int(length.max())
    parts = None
    for k in range(max_len):  # bounded by 15
        word_k = _WORDS[(start + k) % w]
        piece = np.where(k < length, np.where(k > 0, " ", "") + word_k, "")
        parts = piece if parts is None else np.char.add(parts.astype(str), piece.astype(str))
    return np.asarray(parts, dtype=object)


def synth_transcripts(spark, n_conv: int = 1000, seed: int = 42, n_pt: int = 8):
    """Distributed deterministic transcript table as a Spark DataFrame."""

    def expand(batches):
        for pdf in batches:
            yield gen_turns(
                pdf["id"].to_numpy(), seed=seed, n_pt=n_pt, n_conv_total=n_conv
            )

    slices = max(8, n_conv // 2048)
    return spark.range(0, n_conv, 1, slices).mapInPandas(expand, SCHEMA_DDL)
