"""Pluggable model artifacts for W2 (rerank) and P7 (language ID).

The reference ships real model files — a pickled SVM classifier for
document-pair ranking (/root/reference/bitextor/docalign/bitextor_rank.py:
22-41 loading data/model/docalign.svm.classifier) and the cld2 language
model inside warc2preprocess. The Spark operators keep deterministic
stand-ins as defaults (so the DuckDB oracles can replay them bit-for-bit);
the loaders here swap real artifacts in behind the SAME pandas-UDF seams
without touching the plan shape:

- W2 rerank: any pickled object exposing the sklearn prediction API
  (``predict_proba`` or ``decision_function``) over the feature matrix
  ``[[z_chars, tok_ratio]]`` — an actual ``sklearn.svm.SVC
  (probability=True)`` drops straight in when sklearn is installed.
- P7 langid: a trigram-profile table ``lang<TAB>trigram`` (tsv; one row
  per profile trigram) — a cld2/cld3-style table exported to text.

Model paths come from the call site or from the environment (read at
query invocation, so a driver can point a whole run at artifacts):

  BITEXTOR_SPARK_RERANK_MODEL   — path to a pickle
  BITEXTOR_SPARK_LANGID_PROFILE — path to a lang\ttrigram tsv

Loaded artifacts are closure-captured by the pandas UDFs and shipped to
executors via task serialization — models of real size (MBs) should be
broadcast instead; the seam is the same.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
DEFAULT_RERANK_PKL = os.path.join(_DATA_DIR, "rerank_model.pkl")
DEFAULT_LANGID_TSV = os.path.join(_DATA_DIR, "langid_profile.tsv")


def _default_artifact_bytes(name: str) -> bytes | None:
    """Packaged default artifact, resolved through the import system.

    ``importlib.resources`` reads the file whether ``bitextor_spark`` is a
    checkout on disk OR a ``spark-submit --py-files`` zip (zipimport) —
    a bare ``os.path`` probe on a ``__file__``-relative path silently
    misses inside a zip, which would degrade the trained defaults to the
    stand-ins on the cluster while the repo run uses the real artifacts.
    Returns None when the artifact is absent (pre-training checkouts)."""
    try:
        from importlib import resources

        p = resources.files("bitextor_spark").joinpath("data", name)
        if p.is_file():
            return p.read_bytes()
    except Exception:
        pass
    return None


class FixedLogisticRerank:
    """Default W2 stand-in: fixed-weight logistic over (z_chars, tok_ratio).

    Mirrors the oracle SQL in queries_batch2.w2_rerank_groups exactly —
    sigmoid(w0*z + w1*tok_ratio). Exposes the sklearn ``predict_proba``
    shape (N, 2) so the real classifier is a drop-in swap.
    """

    def __init__(self, w_z: float = 1.5, w_tok: float = 0.5):
        self.w_z = w_z
        self.w_tok = w_tok

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = self.w_z * X[:, 0] + self.w_tok * X[:, 1]
        p1 = 1.0 / (1.0 + np.exp(-z))
        return np.column_stack([1.0 - p1, p1])


class TrainedLogisticRerank:
    """The committed default W2 artifact: a logistic-regression classifier
    TRAINED by tools/train_rerank.py (numpy gradient descent on a seeded
    synthetic ranking-quality set) and pickled to data/rerank_model.pkl —
    the same artifact lifecycle as the reference's shipped SVM
    (/root/reference/bitextor/data/model/docalign.svm.classifier loaded in
    bitextor/docalign/bitextor_rank.py:22-41). Exposes the sklearn
    ``predict_proba`` API plus ``coef_``/``intercept_`` so the DuckDB
    oracle can replay the learned weights bit-for-bit."""

    def __init__(self, coef, intercept: float):
        self.coef_ = np.asarray(coef, dtype=np.float64)
        self.intercept_ = float(intercept)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = np.asarray(X, dtype=np.float64) @ self.coef_ + self.intercept_
        p1 = 1.0 / (1.0 + np.exp(-z))
        return np.column_stack([1.0 - p1, p1])


def load_rerank_model(path: str | None = None):
    """W2 model artifact: pickle at `path` (or $BITEXTOR_SPARK_RERANK_MODEL),
    else the committed trained default (data/rerank_model.pkl), else the
    deterministic fixed-weight stand-in. Every branch is oracle-replayable
    via linear_rerank_params."""
    path = path or os.environ.get("BITEXTOR_SPARK_RERANK_MODEL")
    if not path:
        blob = _default_artifact_bytes("rerank_model.pkl")
        if blob is None:
            return FixedLogisticRerank()
        return pickle.loads(blob)
    with open(path, "rb") as fh:
        return pickle.load(fh)


def linear_rerank_params(model) -> tuple[float, float, float] | None:
    """(w_z, w_tok, intercept) for oracle replay of linear-logistic models;
    None for opaque artifacts (env-pointed real SVMs etc.)."""
    if isinstance(model, TrainedLogisticRerank):
        return float(model.coef_[0]), float(model.coef_[1]), model.intercept_
    if isinstance(model, FixedLogisticRerank):
        return model.w_z, model.w_tok, 0.0
    return None


def rerank_scores(model, X: np.ndarray) -> np.ndarray:
    """Positive-class score from any sklearn-API model (predict_proba
    column 1, falling back to decision_function)."""
    if hasattr(model, "predict_proba"):
        return np.asarray(model.predict_proba(X))[:, 1]
    return np.asarray(model.decision_function(X), dtype=float)


def load_langid_profile(
    path: str | None = None,
    default: dict[str, tuple[str, ...]] | None = None,
) -> list[tuple[str, str]]:
    """P7 profile rows (lang, trigram): tsv at `path` (or
    $BITEXTOR_SPARK_LANGID_PROFILE), else the committed corpus-derived
    default (data/langid_profile.tsv, built by tools/build_langid_profile
    from the per-language seed corpora), else the built-in fallback dict."""
    path = path or os.environ.get("BITEXTOR_SPARK_LANGID_PROFILE")
    if not path:
        blob = _default_artifact_bytes("langid_profile.tsv")
        if blob is None:
            assert default is not None
            return [
                (lang, t)
                for lang, tris in sorted(default.items())
                for t in tris
            ]
        lines = blob.decode("utf-8").splitlines()
    else:
        with open(path, encoding="utf-8") as fh:
            lines = fh.read().splitlines()
    rows: list[tuple[str, str]] = []
    for line in lines:
        if not line or line.startswith("#"):
            continue
        lang, _, tri = line.partition("\t")
        rows.append((lang, tri))
    return rows
