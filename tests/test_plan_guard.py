"""Pin the plan-audit unpartitioned-window guard's parser.

The formatted-plan grammar it decodes (empty specs are OMITTED, not
rendered as []):

- ``Window``: 3 groups = [exprs], [partition], [order];
  2 groups = [exprs], [order]  (unpartitioned, ordered)
           or [exprs], [partition]  (partitioned, unordered) —
  disambiguated by ASC/DESC markers in the last group.
- ``WindowGroupLimit``: [partition], [order], fn, k, mode; a global
  one omits the partition group.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)

unpartitioned_windows = plan_audit.unpartitioned_windows


def _block(header: str, args: str) -> str:
    return f"(7) {header}\nInput [2]: [a#1L, b#2L]\nArguments: {args}"


def test_global_ordered_window_flags():
    plan = _block(
        "Window",
        "[row_number() windowspecdefinition(cents#1L ASC NULLS FIRST, x) AS rn#3], "
        "[cents#1L ASC NULLS FIRST, o_orderkey#2L ASC NULLS FIRST]",
    )
    assert unpartitioned_windows(plan) == ["cents+o_orderkey"]


def test_partitioned_ordered_window_clears():
    plan = _block(
        "Window",
        "[row_number() windowspecdefinition(g#9, a#1L ASC NULLS FIRST, x) AS rn#3], "
        "[g#9], [a#1L ASC NULLS FIRST]",
    )
    assert unpartitioned_windows(plan) == []


def test_partitioned_unordered_window_clears():
    # count(1) OVER (PARTITION BY day, event_type) — 2 groups but the
    # last one has no ASC/DESC, so it is the partition spec
    plan = _block(
        "Window",
        "[count(1) windowspecdefinition(day#80L, event_type#75, x) AS n#84L], "
        "[day#80L, event_type#75]",
    )
    assert unpartitioned_windows(plan) == []


def test_band_offset_window_whitelisted():
    # the banded_row_number offset window: ordered over _band only,
    # input is the one-row-per-band count relation
    plan = _block(
        "Window",
        "[sum(_bn#12L) windowspecdefinition(_band#27L ASC NULLS FIRST, x) AS _we0#19L], "
        "[_band#27L ASC NULLS FIRST]",
    )
    assert unpartitioned_windows(plan) == []


def test_partitioned_window_group_limit_clears():
    plan = _block(
        "WindowGroupLimit",
        "[query_id#4L], [sim#20 DESC NULLS LAST, cand_id#10L ASC NULLS FIRST], "
        "row_number(), 10, Partial",
    )
    assert unpartitioned_windows(plan) == []


def test_global_window_group_limit_flags():
    plan = _block(
        "WindowGroupLimit",
        "[sim#20 DESC NULLS LAST], row_number(), 10, Partial",
    )
    assert unpartitioned_windows(plan) == ["sim"]


def test_multiple_blocks_counted_independently():
    bad = _block(
        "Window",
        "[rank() windowspecdefinition(v#1L DESC NULLS LAST, x) AS r#2], "
        "[v#1L DESC NULLS LAST]",
    )
    good = _block(
        "Window",
        "[rank() windowspecdefinition(g#9, v#1L DESC NULLS LAST, x) AS r#2], "
        "[g#9], [v#1L DESC NULLS LAST]",
    )
    assert unpartitioned_windows(bad + "\n\n" + good) == ["v"]
