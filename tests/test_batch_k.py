"""Batch-K tests: OHLC bars, time-weighted average (TWAP)."""

from __future__ import annotations

from collections import defaultdict

from parquet_to_csv_spark.operators import timeops
from parquet_to_csv_spark.sources.tables import load_table


def _cents(v: float) -> int:
    return int(v * 100 + 0.5)


def test_ohlc_bars_replay(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    groups: dict = defaultdict(list)
    for r in ev:
        tus = r.ts // 1000
        hs_ms = (tus // 3_600_000_000) * 3_600_000
        groups[(hs_ms, r.event_type)].append(((tus, r.event_id), _cents(r.value)))
    expect = {}
    for k, rows in groups.items():
        rows.sort()
        cs = [c for _, c in rows]
        expect[k] = (
            len(rows),
            rows[0][1] / 100.0,
            max(cs) / 100.0,
            min(cs) / 100.0,
            rows[-1][1] / 100.0,
        )
    got = {
        (r.hs_ms, r.event_type): (r.n_events, r.open_v, r.high_v, r.low_v, r.close_v)
        for r in timeops.ohlc_bars(spark, sf_dir).collect()
    }
    assert got == expect
    # a bar with >1 event must exist so open != close is actually exercised
    assert any(n > 1 for n, *_ in expect.values())


def test_time_weighted_avg_replay(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    days: dict = defaultdict(list)
    for r in ev:
        tus = r.ts // 1000
        day_ms = (tus // 86_400_000_000) * 86_400_000
        days[(r.user_id, day_ms)].append((tus, r.event_id, _cents(r.value)))
    expect = {}
    for (uid, day_ms), rows in days.items():
        rows.sort()
        end = day_ms * 1000 + 86_400_000_000
        wsum = dsum = 0
        for i, (tus, _, c) in enumerate(rows):
            nxt = rows[i + 1][0] if i + 1 < len(rows) else end
            dt = nxt - tus
            wsum += c * dt
            dsum += dt
        expect[(uid, day_ms)] = (len(rows), dsum, (wsum * 100 // dsum) / 10000.0)
    got = {
        (r.user_id, r.day_ms): (r.n_events, r.held_us, r.twap_v)
        for r in timeops.time_weighted_avg(spark, sf_dir).collect()
    }
    assert got == expect
    # multi-event user-days must exist, else LOCF weighting is untested
    assert any(n > 1 for n, *_ in expect.values())
