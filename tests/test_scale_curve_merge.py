"""Unit tests for scale_curve.py's batched-measurement merge (round 9).

The natural ladder is measured rung-at-a-time (multi-GB fixtures are
generated, measured, reclaimed), so the JSON merge must EXTEND committed
curves with new rung points instead of overwriting a query's entry with
whatever subset of rungs still has fixtures on disk. Pure-python — no
SparkSession.
"""

from __future__ import annotations

import importlib.util
import math

_spec = importlib.util.spec_from_file_location(
    "scale_curve", "/root/repo/scripts/scale_curve.py"
)
scale_curve = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_curve)

LADDER = [("nat1x", "/x/1"), ("nat3x", "/x/3"), ("nat10x", "/x/10")]


def _pt(tag, sec, in_rows, out_rows, cand=None):
    p = {"tag": tag, "sec": sec, "in_rows": in_rows, "out_rows": out_rows}
    if cand is not None:
        p["cand_rows"] = cand
    return p


def test_steps_alpha_exact_for_known_exponents():
    # sec grows exactly linearly (alpha 1), output quadratically (alpha 2)
    pts = [_pt("nat1x", 1.0, 100, 10), _pt("nat10x", 10.0, 1000, 1000)]
    (step,) = scale_curve._steps_of(pts)
    assert step["step"] == "nat1x->nat10x"
    assert step["alpha_time"] == 1.0
    assert step["alpha_out"] == 2.0
    assert "alpha_cand" not in step  # no cand tap on either point


def test_steps_alpha_cand_only_when_both_points_have_it():
    pts = [
        _pt("nat1x", 1.0, 100, 10, cand=100),
        _pt("nat3x", 3.0, 300, 30, cand=300),
        _pt("nat10x", 10.0, 1000, 100),  # tap not run at the top rung
    ]
    steps = scale_curve._steps_of(pts)
    assert "alpha_cand" in steps[0] and steps[0]["alpha_cand"] == 1.0
    assert "alpha_cand" not in steps[1]


def test_merge_extends_committed_curve_with_new_top_rung():
    name = next(iter(scale_curve.QUERY_TABLE))
    prev = {
        name: {
            "table": "documents",
            "points": [_pt("nat1x", 1.0, 100, 10), _pt("nat3x", 3.1, 300, 30)],
            "steps": [],
        }
    }
    fresh = {
        name: {
            "table": "documents",
            # partial-ladder re-measure: top rung + a RE-measured nat3x
            "points": [_pt("nat3x", 2.9, 300, 30), _pt("nat10x", 10.0, 1000, 95)],
            "steps": [],
        }
    }
    merged = scale_curve._merge_queries(prev, fresh, LADDER)
    pts = merged[name]["points"]
    assert [p["tag"] for p in pts] == ["nat1x", "nat3x", "nat10x"]
    assert pts[1]["sec"] == 2.9  # the fresh measurement wins the tie
    steps = merged[name]["steps"]
    assert [s["step"] for s in steps] == ["nat1x->nat3x", "nat3x->nat10x"]
    # recomputed over the merged points, not carried from either input
    assert steps[1]["alpha_time"] == round(
        math.log(10.0 / 2.9) / math.log(1000 / 300), 2
    )


def test_merge_keeps_unmeasured_queries_untouched():
    names = list(scale_curve.QUERY_TABLE)
    keep, touch = names[0], names[1]
    prev = {
        keep: {"table": "documents", "points": [_pt("nat1x", 1, 100, 1)],
               "steps": []},
        touch: {"table": "documents", "points": [_pt("nat1x", 2, 100, 1)],
                "steps": []},
    }
    fresh = {
        touch: {"table": "documents", "points": [_pt("nat3x", 6, 300, 3)],
                "steps": []}
    }
    merged = scale_curve._merge_queries(prev, fresh, LADDER)
    assert merged[keep]["points"] == [_pt("nat1x", 1, 100, 1)]
    assert [p["tag"] for p in merged[touch]["points"]] == ["nat1x", "nat3x"]


def test_nat1000_rung_is_scoped_to_the_flagship_trio():
    runs = {
        q
        for q in scale_curve.NATURAL_QUERIES
        if (q, "nat1000x") not in scale_curve.NATURAL_SKIP
    }
    assert runs == scale_curve._NAT1000_QUERIES
