"""Independent (pandas) brute-force checks for the round-7 timeseries
additions — the oracle shares derivation structure with the Spark
plans, so these recompute the answers a third way."""

from __future__ import annotations

import numpy as np
import pandas as pd

from burla_spark.plans import timeseries as ts


def test_frequent_event_sequences_matches_bruteforce(spark, sf_dir):
    out = {
        r["seq"]: (r["support"], r["n_users"])
        for r in ts.frequent_event_sequences(spark, sf_dir).collect()
    }

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e.sort_values(["user_id", "ts", "event_id"])
    support: dict[str, int] = {}
    users: dict[str, set] = {}
    for uid, g in e.groupby("user_id"):
        types = g["event_type"].tolist()
        for i in range(len(types) - ts.SEQ_N + 1):
            s = ">".join(types[i : i + ts.SEQ_N])
            support[s] = support.get(s, 0) + 1
            users.setdefault(s, set()).add(uid)
    expect = sorted(
        ((s, c, len(users[s])) for s, c in support.items()),
        key=lambda t: (-t[1], t[0]),
    )[: ts.SEQ_TOP]
    assert out == {s: (c, u) for s, c, u in expect}
    assert len(out) == min(ts.SEQ_TOP, len(support)) > 0


def test_seasonal_profile_matches_bruteforce(spark, sf_dir):
    rows = ts.seasonal_hourly_profile(spark, sf_dir).collect()
    assert rows

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    # mirror load_table's nanos->micros normalization implicitly via
    # pandas (ns timestamps); the hour index only needs second grain.
    # normalize to ns first: pyarrow hands pandas datetime64[us], whose
    # raw int64 is MICROseconds — dividing that by 1e9 collapsed every
    # event into two "hours"
    e["h"] = e["ts"].astype("datetime64[ns]").astype("int64") // 10**9 // 3600
    # dec(value): DECIMAL(18,4) quantization — fixture values are 2 dp,
    # so plain float sums are exact here
    hourly = (
        e.groupby(["event_type", "h"])["value"]
        .agg(["sum", "count"])
        .reset_index()
        .sort_values(["event_type", "h"])
    )
    expect = {}
    for et, g in hourly.groupby("event_type"):
        g = g.reset_index(drop=True)
        hmin, hmax = g["h"].min(), g["h"].max()
        devs: dict[int, list[float]] = {}
        for _, r in g.iterrows():
            lo, hi = r["h"] - ts.SEASONAL_HALF, r["h"] + ts.SEASONAL_HALF
            win = g[(g["h"] >= lo) & (g["h"] <= hi)]
            trend = win["sum"].sum() / win["count"].sum()
            if hmin + ts.SEASONAL_HALF <= r["h"] <= hmax - ts.SEASONAL_HALF:
                hmean = r["sum"] / r["count"]
                devs.setdefault(int(r["h"] % 24), []).append(
                    round(hmean - trend, 6)
                )
        for hod, ds in devs.items():
            expect[(et, hod)] = (len(ds), sum(ds) / len(ds))

    assert len(rows) == len(expect)
    for r in rows:
        n, seasonal = expect[(r["event_type"], r["hod"])]
        assert r["n_hours"] == n
        assert abs(r["seasonal"] - seasonal) < 1e-6, (
            r["event_type"], r["hod"], r["seasonal"], seasonal,
        )
    # seasonal components must not all be identical (vacuity guard)
    vals = {r["seasonal"] for r in rows}
    assert len(vals) > 1
    assert isinstance(np.mean([abs(v) for v in vals]), float)


def test_cusum_localizes_planted_changepoint(spark, tmp_path):
    """A level shift planted at i=120 of 200 (10.00 → 25.00 with a
    small deterministic wobble) must be localized EXACTLY by the
    integer CUSUM argmax, with the segment means recovered."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        level = 10.0 if i < 120 else 25.0
        # ±0.25 deterministic wobble so the series isn't degenerate
        rows.append(
            (
                i,
                t0 + dt.timedelta(minutes=i),
                1,
                "metric",
                level + (0.25 if i % 2 else -0.25),
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = ts.cusum_changepoints(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # |C_i| = i*(n-i)/n * |mean_after - mean_before| is maximized at
    # the true boundary for a clean step: the argmax must land there
    assert r["cp_index"] == 120
    assert r["n_events"] == 200
    assert abs(r["mean_before"] - 10.0) < 1e-9
    assert abs(r["mean_after"] - 25.0) < 1e-9
    # C_120 = 120*(15.0 - overall drift)… check against brute force
    vals = [v[4] for v in rows]
    mean = sum(vals) / len(vals)
    best = max(
        (abs(sum(vals[: i + 1]) - (i + 1) * mean), i + 1)
        for i in range(len(vals))
    )
    assert abs(r["cusum_stat"] - round(best[0], 6)) < 1e-6


def test_cusum_stat_matches_bruteforce_on_fixture(spark, sf_dir):
    """Fixture parity a third way (pandas): per event_type the argmax
    row and exact statistic match an O(n) float-free recompute."""
    out = {r["event_type"]: r for r in ts.cusum_changepoints(spark, sf_dir).collect()}
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e.sort_values(["ts", "event_id"])
    for et, g in e.groupby("event_type"):
        v = (g["value"] * ts._CUSUM_SCALE).round().astype("int64").to_numpy()
        n = len(v)
        prefix = np.cumsum(v)
        i = np.arange(1, n + 1)
        d = n * prefix - i * v.sum()
        absd = np.abs(d)
        k = int(np.argmax(absd))  # first occurrence == earliest tie
        r = out[et]
        assert r["cp_index"] == k + 1
        assert r["n_events"] == n
        assert abs(r["cusum_stat"] - round(absd[k] / n / ts._CUSUM_SCALE, 6)) < 1e-9


def test_attribution_matches_bruteforce(spark, sf_dir):
    """Per-purchase replay in pandas: earliest/latest in-window touch
    per purchase, credit rolled up per (model, touch_type) — must
    equal the windowed-plan output exactly."""
    out = {
        (r["model"], r["touch_type"]): (r["n_conversions"], r["credited_value"])
        for r in ts.multi_touch_attribution(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["ts_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    expect: dict[tuple[str, str], list[int]] = {}
    for uid, g in e.groupby("user_id"):
        g = g.sort_values("ts_us")
        touches = g[g["event_type"].isin(ts._ATTR_TOUCHES)]
        for p in g[g["event_type"] == "purchase"].itertuples():
            lo = p.ts_us - ts._ATTR_LOOKBACK_US
            w = touches[(touches["ts_us"] >= lo) & (touches["ts_us"] < p.ts_us)]
            v_fp = int(round(p.value * 100))
            if len(w) == 0:
                picks = {"first_touch": "direct", "last_touch": "direct"}
            else:
                key = w["ts_us"] * 4096 + w["event_id"] % 4096
                picks = {
                    "first_touch": w.loc[key.idxmin(), "event_type"],
                    "last_touch": w.loc[key.idxmax(), "event_type"],
                }
            for model, ttype in picks.items():
                agg = expect.setdefault((model, ttype), [0, 0])
                agg[0] += 1
                agg[1] += v_fp
    assert set(out) == set(expect)
    for k, (n, v_fp) in expect.items():
        assert out[k][0] == n, (k, out[k], n)
        assert abs(out[k][1] - round(v_fp / 100, 6)) < 1e-9
    # both models must be non-degenerate AND actually differ somewhere
    # (vacuity guard: the 6h window makes first != last for some user)
    first = {t: n for (m, t), (n, _) in expect.items() if m == "first_touch"}
    last = {t: n for (m, t), (n, _) in expect.items() if m == "last_touch"}
    assert first != last
    assert "direct" in first and len(first) > 1
