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


def test_default_rerank_is_trained_replayable_artifact(clean_env):
    """The committed default is the TRAINED pickle (tools/train_rerank.py)
    and its scores replay exactly from its exposed linear params — the
    property the DuckDB oracle depends on."""
    from bitextor_spark.models import (
        TrainedLogisticRerank,
        linear_rerank_params,
    )

    m = load_rerank_model()
    assert isinstance(m, TrainedLogisticRerank)
    w0, w1, b = linear_rerank_params(m)
    X = np.array([[0.0, 0.0], [1.0, 2.0], [-3.0, 0.5]])
    want = 1.0 / (1.0 + np.exp(-(w0 * X[:, 0] + w1 * X[:, 1] + b)))
    assert np.allclose(rerank_scores(m, X), want)
    # a real (non-degenerate) learned model
    assert w0 > 0 and w1 > 0 and b != 0.0


def test_default_rerank_pickle_fresh(clean_env):
    """Drift guard: retraining reproduces the committed artifact."""
    import importlib.util
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "train_rerank", _os.path.join(repo, "tools", "train_rerank.py")
    )
    tr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tr)
    coef, intercept = tr.train(*tr.make_dataset())
    m = load_rerank_model()
    assert np.allclose(coef, m.coef_) and np.isclose(intercept, m.intercept_)


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


HELD_OUT = {
    # sentences NOT in the seed corpora — the profile must still place them
    "en": "people often ask whether the new rules will change anything at all",
    "es": "muchas personas preguntan si las nuevas reglas van a cambiar algo",
    "fr": "beaucoup de gens se demandent si les nouvelles regles vont changer quelque chose",
    "de": "viele menschen fragen sich ob die neuen regeln irgendetwas aendern werden",
    "it": "molte persone si chiedono se le nuove regole cambieranno davvero qualcosa",
    "pt": "muitas pessoas perguntam se as novas regras vao mudar alguma coisa",
    "nl": "veel mensen vragen zich af of de nieuwe regels iets zullen veranderen",
    "fi": "monet ihmiset kysyvat muuttavatko uudet saannot mitaan lainkaan",
    "tr": "bircok insan yeni kurallarin herhangi bir seyi degistirip degistirmeyecegini soruyor",
}


def test_default_langid_profile_identifies_held_out_text(clean_env):
    """The committed 17-language profile, scored exactly the way the
    pipeline scores (overlapping-trigram hits, argmax, lexicographic tie),
    identifies held-out sentences in 9 languages."""
    import re
    from collections import Counter

    rows = load_langid_profile(default={})
    assert len({lang for lang, _ in rows}) == 17
    prof: dict[str, Counter] = {}
    for lang, t in rows:
        prof.setdefault(lang, Counter())[t] += 1
    for want_lang, sent in HELD_OUT.items():
        s = re.sub(r"[^a-z ]", "", sent.lower())
        tris = [s[i: i + 3] for i in range(len(s) - 2)]
        scores = {
            lang: sum(cnt[t] for t in tris) for lang, cnt in prof.items()
        }
        best = max(sorted(scores), key=lambda lg: scores[lg])
        assert best == want_lang, (want_lang, sorted(
            scores.items(), key=lambda kv: -kv[1])[:3])


def test_default_langid_profile_fresh(clean_env):
    """Drift guard: rebuilding from the committed corpora reproduces the
    committed TSV."""
    import importlib.util
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "build_langid_profile",
        _os.path.join(repo, "tools", "build_langid_profile.py"),
    )
    bp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bp)
    assert bp.build() == load_langid_profile(default={})


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
