"""Train and pickle the default W2 rerank classifier artifact.

The reference ships a TRAINED pickled classifier as repo data
(/root/reference/bitextor/data/model/docalign.svm.classifier, loaded at
bitextor/docalign/bitextor_rank.py:22-41) and scores candidate pairs with
``predict_proba``. This builder reproduces that artifact lifecycle without
sklearn in the container: a logistic-regression classifier over the same
feature space the W2 operator computes — ``z_chars`` (group-centered
length, /1000) and ``tok_ratio`` (token count /100) — trained by plain
numpy gradient descent on a deterministic synthetic labeled set (latent
quality + noise, seeded), then pickled to
``bitextor_spark/data/rerank_model.pkl`` as the committed default
``models.load_rerank_model`` serves.

The trained object is ``models.TrainedLogisticRerank`` (sklearn
``predict_proba`` API + exposed ``coef_``/``intercept_``), so the DuckDB
oracle can replay it as ``sigmoid(w0*z + w1*tok + b)`` with the learned
weights baked in — a real trained artifact that stays bit-replayable.

Run: ``python tools/train_rerank.py`` (idempotent; fixed seed).
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bitextor_spark.models import TrainedLogisticRerank  # noqa: E402

OUT = os.path.join(REPO, "bitextor_spark", "data", "rerank_model.pkl")


def make_dataset(n: int = 20_000, seed: int = 1234):
    """Synthetic ranking-quality set over the operator's feature space:
    label = 1 when a noisy latent quality (longer-than-group-average docs
    with healthy token density) is positive."""
    rng = np.random.default_rng(seed)
    z_chars = rng.normal(0.0, 1.2, n)          # group-centered length /1000
    tok_ratio = rng.gamma(2.0, 1.5, n)          # token count /100, >= 0
    latent = 1.3 * z_chars + 0.45 * tok_ratio - 1.1
    y = (latent + rng.logistic(0.0, 0.7, n) > 0).astype(np.float64)
    return np.column_stack([z_chars, tok_ratio]), y


def train(X: np.ndarray, y: np.ndarray, lr: float = 0.3,
          iters: int = 4000, l2: float = 1e-4):
    """Batch gradient descent on L2-regularized logistic loss."""
    n, d = X.shape
    Xb = np.column_stack([X, np.ones(n)])
    w = np.zeros(d + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        grad = Xb.T @ (p - y) / n + l2 * w
        w -= lr * grad
    return w[:d], w[d]


def main() -> None:
    X, y = make_dataset()
    coef, intercept = train(X, y)
    model = TrainedLogisticRerank(coef, intercept)
    acc = float(np.mean((model.predict_proba(X)[:, 1] > 0.5) == (y > 0.5)))
    with open(OUT, "wb") as fh:
        pickle.dump(model, fh, protocol=4)
    print(f"coef={coef.tolist()} intercept={float(intercept)} "
          f"train_acc={acc:.3f} -> {OUT}")


if __name__ == "__main__":
    main()
