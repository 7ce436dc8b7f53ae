#!/usr/bin/env python3
"""Hostile-events differential for the time-series oracle twins — the
events counterpart of tools/{unicode,vectors}_differential.py.

Generates an events table of adversarial rows in the driver's exact
parquet shape (timestamp[us] ts): NaN / +Inf / -Inf / mixed-infinity
`value`s (sum poisoning through the window aggregates), events exactly
ON hour boundaries and 30-min session boundaries, duplicate
(user_id, ts) instants (the sessionizer's event_id tiebreak),
pre-1970 and far-future (year 9999) timestamps, and a dense normal
load. The caller runs the REAL gate:

    python3 tools/events_differential.py /tmp/graft_events
    sbt -batch "runMain graft.Verify /tmp/graft_events /tmp/verify_ev \
        q9_event_windows q10_sessionize q13_session_window"
    GRAFT_HOSTILE_DATA=1 python3 tools/selfcheck.py /tmp/graft_events /tmp/verify_ev

NOTE the 30-min-boundary docs are deliberately INCLUDED here even
though selfcheck's driver-testdata guard rejects them for the shared
corpus: both sessionizers CONTINUE the session on an exact-boundary
gap (pinned by RelationalSpec on a temp parquet), and this harness
exists to prove the DuckDB twins agree on that too — which they must,
since both sides compare `gap > threshold`. Any FAIL is a live engine
seam (sum/NaN semantics, timestamp formatting, window alignment).
"""
import math
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
BASE = 1_700_000_000 * US  # 2023-11-14 22:13:20 UTC


def main():
    out_dir = sys.argv[1]
    random.seed(20260820)
    rows = []  # (event_id, ts_us, user_id, event_type, value, props)
    eid = 0

    def add(ts_us, user, etype, value):
        nonlocal eid
        rows.append((eid, ts_us, user, etype, value, "{}"))
        eid += 1

    # user 1: NaN / infinity values inside one hour window each
    add(BASE, 1, "view", float("nan"))
    add(BASE + 10 * US, 1, "view", 1.5)
    add(BASE + 3600 * US, 1, "click", float("inf"))
    add(BASE + 3610 * US, 1, "click", 2.0)
    add(BASE + 7200 * US, 1, "buy", float("inf"))
    add(BASE + 7210 * US, 1, "buy", float("-inf"))  # inf + -inf = NaN
    # user 2: exact hour-boundary instants and duplicate instants
    hour = (BASE // (3600 * US)) * 3600 * US
    add(hour, 2, "view", 1.0)             # exactly on the hour
    add(hour + 3600 * US, 2, "view", 1.0)  # next boundary
    add(hour + 3600 * US, 2, "view", 2.0)  # duplicate instant, same user
    # user 3: session gaps just-below / exactly-at / just-above 30 min
    t = BASE
    for gap_s in (1799, 1800, 1801, 600):
        add(t, 3, "view", 0.125)  # binary-exact tie through sums
        t += gap_s * US
    add(t, 3, "view", 0.125)
    # user 4: pre-1970 and far-future instants
    add(-365 * 86400 * US, 4, "view", 1.0)          # 1969
    add(-365 * 86400 * US + 1800 * US, 4, "view", 2.0)
    add(253_370_764_800 * US, 4, "click", 3.0)      # year 9999
    # dense normal load
    for i in range(2000):
        add(BASE + random.randint(0, 6 * 3600) * US + random.randint(0, US - 1),
            5 + i % 40, random.choice(["view", "click", "buy"]),
            round(random.uniform(-50, 50), 2))

    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({"event_id": [r[0] for r in rows],
                  "ts": [r[1] for r in rows],
                  "user_id": [r[2] for r in rows],
                  "event_type": [r[3] for r in rows],
                  "value": [r[4] for r in rows],
                  "props": [r[5] for r in rows]}, schema=schema),
        f"{out_dir}/events.parquet")
    print(f"wrote {len(rows)} hostile events to {out_dir}/events.parquet")


if __name__ == "__main__":
    main()
