"""Offline protocol gate for the failure-mode discovery suite (the
reference's fifth benchmark suite,
/root/reference/benchmarks/failure_mode_discovery/): discover -> aggregate
-> evaluate coverage must run deterministically on the frozen synthetic
trace corpus with the fake LM, end to end through the LazyFrame pipeline.
"""

import pandas as pd

from benchmarks import failure_modes as fm


def _fresh_models():
    oracle, helper = fm.configure_models()
    oracle.reset_stats()
    return oracle, helper


def test_corpus_shape_and_split():
    train, test = fm.load_data()
    assert len(train) + len(test) == 24
    # Both halves must contain failures of every mode (stratified enough
    # for the aggregation to see the full taxonomy).
    for df in (train, test):
        assert set(df[df["failed"]]["true_mode"]) == set(fm._MODES.values())
        assert (~df["failed"]).sum() >= 2


def test_parse_failure_modes_strips_bullets_and_numbering():
    text = "- step repetition\n2. tool misuse\n  * context loss\n\n"
    assert fm.parse_failure_modes(text) == ["step repetition", "tool misuse", "context loss"]
    assert fm.parse_failure_modes(None) == []


def test_discovery_pipeline_end_to_end_coverage():
    oracle, helper = _fresh_models()
    train, test = fm.load_data()

    out = fm.build_pipeline().execute(test)
    # The filter must drop every success trace; the aggregation + explode
    # must surface one row per discovered mode.
    modes = set(out["failure_modes"].dropna())
    assert modes == set(fm._MODES.values())

    metrics = fm.evaluate(out, test, oracle, helper)
    assert metrics["coverage"] == 1.0
    assert metrics["n_total"] == int(test["failed"].sum())
    assert metrics["n_covered"] == metrics["n_total"]
    assert metrics["n_modes"] == len(fm._MODES)
    assert metrics["total_tokens"] > 0


def test_coverage_drops_when_modes_are_missing():
    oracle, helper = _fresh_models()
    _, test = fm.load_data()
    # A failure list missing most modes must NOT get full coverage credit.
    partial = pd.DataFrame({"failure_modes": ["step repetition"]})
    metrics = fm._coverage(partial, test)
    assert 0.0 < metrics["coverage"] < 1.0
    assert metrics["n_modes"] == 1


def test_optimize_protocol_runs_and_keeps_coverage():
    oracle, helper = _fresh_models()
    train, test = fm.load_data()
    lf = fm.build_pipeline()
    eval_fn = fm.make_eval_fn(train)
    optimized = fm.optimize_pipeline(lf, train, eval_fn, max_metric_calls=2)
    out = optimized.execute(test)
    assert fm._coverage(out, test)["coverage"] == 1.0
