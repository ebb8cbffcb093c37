"""Batched model-inference stage: the actor-pool shape for scoring a corpus
with a trained model (quality classifier, perplexity filter, reward model).

Plumbing is the real thing — weights load ONCE per actor in ``__init__``
(with a real model this is the expensive checkpoint load), every batch runs
one vectorized pass (with a real model: one forward per batch, never per
row), scores stream out with the rows. The MODEL is a deterministic stub
(no ML runtime in this environment): a logistic scorer over exact integer
text statistics (char/token counts — ``functions/text.py`` kernels with SQL
mirrors), so the driver oracle can recompute every score in DuckDB and the
whole inference path is hash-checkable, not just smoke-tested.

Swap-in note: replace ``_StubModel`` with a real classifier loaded in
``__init__`` and the Ray-side contract (actor pool via
``map_batches(cls, concurrency=N, batch_size=B)``, fixed output schema)
does not change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd  # noqa: F401  (type refs)

from ..functions.text import char_count, token_count

#: default stub weights: (bias, per-100-chars, per-10-tokens)
DEFAULT_WEIGHTS = (-1.0, 0.25, 0.8)


class _StubModel:
    """Deterministic 'model': logistic over integer text statistics.
    Feature scaling uses exact integer inputs so numpy and the SQL oracle
    compute bit-identical z; the sigmoid output is floored to 4 decimals
    (the cosine-parity convention) to absorb last-ulp ``exp`` differences
    between engines."""

    def __init__(self, weights=DEFAULT_WEIGHTS):
        self.w = np.asarray(weights, dtype=np.float64)

    def predict(self, n_chars: np.ndarray, n_tokens: np.ndarray) -> np.ndarray:
        z = (
            self.w[0]
            + self.w[1] * (n_chars.astype(np.float64) / 100.0)
            + self.w[2] * (n_tokens.astype(np.float64) / 10.0)
        )
        s = 1.0 / (1.0 + np.exp(-z))
        return np.floor((s + 1e-9) * 1e4) / 1e4


class ModelScoreStage:
    """Actor-pool scoring stage: ``__init__`` = model load (once per
    actor), ``__call__`` = one batched forward. Output: input columns minus
    text, plus ``score`` (float64 in [0, 1])."""

    def __init__(self, *, text_col: str = "text", weights=DEFAULT_WEIGHTS):
        self.text_col = text_col
        self.model = _StubModel(weights)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_chars = char_count(text).to_numpy(zero_copy_only=False)
        n_tokens = token_count(text).to_numpy(zero_copy_only=False)
        score = self.model.predict(n_chars, n_tokens)
        return batch.drop_columns([self.text_col]).append_column(
            "score", pa.array(score, pa.float64())
        )


def score_documents(
    docs: "rd.Dataset",
    *,
    text_col: str = "text",
    weights=DEFAULT_WEIGHTS,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 1024,
) -> "rd.Dataset":
    """Score a corpus with the actor-pool inference stage (model state per
    actor, batched forwards, streaming output)."""
    return docs.map_batches(
        ModelScoreStage,
        fn_constructor_kwargs={"text_col": text_col, "weights": weights},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
