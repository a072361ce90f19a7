"""Unit pins for tools.bench_compare (VERDICT_r10 #4) — pure-python,
no Spark: doc-shape normalization, prefix matching, calib
normalization arithmetic, and the jitter floor."""

from __future__ import annotations

import json

from tools.bench_compare import compare, load_doc


def _doc(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def test_both_doc_shapes_and_normalization(tmp_path):
    a = load_doc(_doc(tmp_path, "a.json", {
        "metric": "t", "value": 100.0, "unit": "sec", "sf": 0.1,
        "calib_sec": 0.4, "n_queries": 2,
        "queries": {"alpha_query": 60.0, "beta_query": 40.0},
    }))
    # driver shape: payload under `parsed`, truncated names in
    # centiseconds, 5-row `queries` map ignored in favor of queries_cs
    b = load_doc(_doc(tmp_path, "b.json", {
        "n": 10, "parsed": {
            "value": 150.0, "calib_sec": 0.6, "n_queries": 2,
            "queries": {"alpha_query": 90.0},
            "queries_cs": {"alpha_qu": 9000, "beta_qu": 6000},
        },
    }))
    rep = compare(a, b)
    assert rep["raw_total_ratio"] == 1.5
    assert rep["calib_ratio"] == 1.5
    # host fully explains the drift → normalized ratio 1.0, no flags
    assert rep["norm_total_ratio"] == 1.0
    assert rep["n_compared"] == 2 and rep["n_unmatched"] == 0
    assert rep["n_flagged"] == 0


def test_real_regression_flagged_and_floor(tmp_path):
    a = load_doc(_doc(tmp_path, "a.json", {
        "value": 10.0, "calib_sec": 0.5, "n_queries": 2,
        "queries": {"big_q": 9.0, "tiny_q": 0.1},
    }))
    b = load_doc(_doc(tmp_path, "b.json", {
        "value": 20.0, "calib_sec": 0.5, "n_queries": 2,
        "queries": {"big_q": 19.0, "tiny_q": 0.3},
    }))
    rep = compare(a, b)
    # same calib → drift is real; big_q flagged, tiny_q (3x raw but
    # under the 0.5 s floor both sides) suppressed as jitter
    assert rep["norm_total_ratio"] == 2.0
    assert [q["query"] for q in rep["flagged"]] == ["big_q"]


def test_missing_calib_degrades_to_raw(tmp_path):
    a = load_doc(_doc(tmp_path, "a.json", {"value": 10.0, "queries": {"q": 10.0}}))
    b = load_doc(_doc(tmp_path, "b.json", {"value": 15.0, "queries": {"q": 15.0}}))
    rep = compare(a, b)
    assert rep["norm_total_ratio"] is None
    assert rep["flag_basis"] == "raw_ratio"
    assert rep["n_flagged"] == 1
