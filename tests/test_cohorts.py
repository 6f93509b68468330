"""Retention cohorts + ordered funnel over a synthetic event stream."""

from datetime import datetime, timedelta

import ray.data as rd

from pero_ocr_ray.functions.cohorts import event_funnel, user_retention
from pero_ocr_ray.util import dataset_to_table

_MON = datetime(2024, 1, 1)  # a Monday: week-truncation fixed point


def _ev(user, ts, typ="view"):
    return {"user_id": user, "ts": ts, "event_type": typ}


def test_retention_offsets_and_counts():
    rows = [
        _ev(1, _MON),                                # cohort w0
        _ev(1, _MON + timedelta(days=8)),            # active w1
        _ev(1, _MON + timedelta(days=9)),            # same week: 1 pair
        _ev(2, _MON + timedelta(days=6, hours=23)),  # cohort w0 (Sunday)
        _ev(2, _MON + timedelta(days=21)),           # active w3
        _ev(3, _MON + timedelta(days=7)),            # cohort w1 only
    ]
    out = (dataset_to_table(user_retention(rd.from_items(rows)))
           .to_pandas().set_index(["cohort_week", "week_offset"])
           .sort_index())
    w0, w1 = _MON, _MON + timedelta(days=7)
    assert out.loc[(w0, 0), "n_users"] == 2
    assert out.loc[(w0, 1), "n_users"] == 1
    assert out.loc[(w0, 3), "n_users"] == 1
    assert out.loc[(w1, 0), "n_users"] == 1
    assert len(out) == 4


def test_retention_partitioning_invariant():
    rows = [_ev(u, _MON + timedelta(days=d)) for u in range(20)
            for d in (u % 3, 7 + u % 5, 14)]
    ds = rd.from_items(rows)
    a = (dataset_to_table(user_retention(ds)).to_pandas()
         .sort_values(["cohort_week", "week_offset"])
         .reset_index(drop=True))
    b = (dataset_to_table(user_retention(ds.repartition(7))).to_pandas()
         .sort_values(["cohort_week", "week_offset"])
         .reset_index(drop=True))
    assert a.equals(b)


def test_funnel_strict_ordering():
    t0 = _MON
    rows = [
        # user 1 completes in order
        _ev(1, t0, "view"), _ev(1, t0 + timedelta(minutes=1), "click"),
        _ev(1, t0 + timedelta(minutes=2), "purchase"),
        # user 2: click BEFORE first view, purchase after -> stops at view
        _ev(2, t0 + timedelta(minutes=5), "click"),
        _ev(2, t0 + timedelta(minutes=6), "view"),
        _ev(2, t0 + timedelta(minutes=7), "purchase"),
        # user 3: view+click but purchase EXACTLY at click ts (not strict)
        _ev(3, t0, "view"), _ev(3, t0 + timedelta(minutes=1), "click"),
        _ev(3, t0 + timedelta(minutes=1), "purchase"),
        # user 4: never views
        _ev(4, t0, "click"), _ev(4, t0 + timedelta(minutes=1), "purchase"),
    ]
    out = (dataset_to_table(event_funnel(rd.from_items(rows)))
           .to_pandas().set_index("step"))
    assert out.loc["1_view", "n_users"] == 3
    assert out.loc["2_click", "n_users"] == 2   # users 1, 3
    assert out.loc["3_purchase", "n_users"] == 1  # user 1 only
    # user 2's click precedes their first view; a later purchase alone
    # must not resurrect them mid-funnel.


def test_funnel_short_circuits_empty_step():
    rows = [_ev(1, _MON, "view"), _ev(2, _MON, "view")]
    out = (dataset_to_table(event_funnel(rd.from_items(rows)))
           .to_pandas().set_index("step"))
    assert out.loc["1_view", "n_users"] == 2
    assert out.loc["2_click", "n_users"] == 0
    assert out.loc["3_purchase", "n_users"] == 0
