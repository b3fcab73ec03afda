"""Pluggable model artifacts (W2 rerank pickle, P7 langid profile table):
the default stand-ins stay oracle-exact, and pointing the env seams at
external artifacts changes the predictions through the SAME plan.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from bitextor_spark.models import (
    FixedLogisticRerank,
    load_langid_profile,
    load_rerank_model,
    rerank_scores,
)

SF_DIR = "/root/testdata/sf0.001"

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("BITEXTOR_SPARK_RERANK_MODEL", raising=False)
    monkeypatch.delenv("BITEXTOR_SPARK_LANGID_PROFILE", raising=False)


def test_default_rerank_matches_fixed_logistic(clean_env):
    m = load_rerank_model()
    X = np.array([[0.0, 0.0], [1.0, 2.0], [-3.0, 0.5]])
    want = 1.0 / (1.0 + np.exp(-(1.5 * X[:, 0] + 0.5 * X[:, 1])))
    assert np.allclose(rerank_scores(m, X), want)


def test_pickled_artifact_roundtrip(tmp_path, clean_env, monkeypatch):
    # a "real" model artifact: same API, different weights
    path = tmp_path / "model.pkl"
    path.write_bytes(pickle.dumps(FixedLogisticRerank(w_z=-2.0, w_tok=0.0)))
    monkeypatch.setenv("BITEXTOR_SPARK_RERANK_MODEL", str(path))
    m = load_rerank_model()
    X = np.array([[1.0, 5.0]])
    assert np.allclose(rerank_scores(m, X), 1.0 / (1.0 + np.exp(2.0)))


class _DecisionOnly:
    def decision_function(self, X):
        return X[:, 0] * 10.0


def test_decision_function_fallback():
    assert np.allclose(
        rerank_scores(_DecisionOnly(), np.array([[0.5, 0.0]])), 5.0
    )


def test_langid_profile_file(tmp_path, clean_env, monkeypatch):
    p = tmp_path / "prof.tsv"
    p.write_text("# comment\nxx\tthe\nxx\tand\nyy\tque\n", encoding="utf-8")
    monkeypatch.setenv("BITEXTOR_SPARK_LANGID_PROFILE", str(p))
    assert load_langid_profile(default={}) == [
        ("xx", "the"), ("xx", "and"), ("yy", "que"),
    ]


@needs_data
def test_w2_swapped_model_changes_ranking(spark, clean_env, monkeypatch):
    """End-to-end through the grouped-map seam: an external artifact with
    inverted weights must produce a different top-5 than the default."""
    from bitextor_spark.queries import QUERIES

    base = {
        (r.doc_id, r.source, r.rnk)
        for r in QUERIES["w2_rerank_groups"](spark, SF_DIR).collect()
    }
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as fh:
        fh.write(pickle.dumps(FixedLogisticRerank(w_z=-1.5, w_tok=-0.5)))
        path = fh.name
    try:
        monkeypatch.setenv("BITEXTOR_SPARK_RERANK_MODEL", path)
        swapped = {
            (r.doc_id, r.source, r.rnk)
            for r in QUERIES["w2_rerank_groups"](spark, SF_DIR).collect()
        }
    finally:
        os.unlink(path)
    assert base != swapped


@needs_data
def test_p7_swapped_profile_changes_langid(spark, clean_env, monkeypatch, tmp_path):
    from bitextor_spark.queries import QUERIES

    p = tmp_path / "prof.tsv"
    # single-language profile: every doc with any hit must predict 'zz'
    p.write_text("zz\tthe\nzz\tand\nzz\tque\nzz\tder\n", encoding="utf-8")
    monkeypatch.setenv("BITEXTOR_SPARK_LANGID_PROFILE", str(p))
    rows = QUERIES["p7_langid_trigram"](spark, SF_DIR).collect()
    assert rows and all(r.pred_lang == "zz" for r in rows)
