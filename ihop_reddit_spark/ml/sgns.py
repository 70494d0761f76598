"""Driver-side Skip-Gram-with-Negative-Sampling community2vec — the
SGNS fallback SURVEY §7 ("what's hard" #1) asks for behind the same
interface as the Spark trainer.

The reference trains community2vec with Gensim SGNS
(``ihop/community2vec.py:157-218``: ``sg=1, hs=0, negative=20,
sample=0, min_count=0, window=max_comments`` — i.e. the window spans the
WHOLE user context, so every ordered (center, other) pair in a context
is a skip-gram example). Spark ML's Word2Vec is skip-gram with
HIERARCHICAL SOFTMAX — same embedding family, different objective — so
this module supplies objective-parity: a pure-numpy SGNS trainer with
the reference's sampling scheme, vectorized minibatch SGD, and a
deterministic seed contract.

ALTITUDE: this is deliberately a DRIVER-LOCAL escape hatch, exactly as
the reference's Gensim trainer is single-node. Community2vec
vocabularies are subreddit-sized (10⁴–10⁵ words) and the context corpus
for one month fits a driver comfortably; the collect is size-guarded.
For corpora beyond the guard, use the distributed
:class:`~ihop_reddit_spark.ml.community2vec.Community2Vec` (Spark ML)
trainer — the two share the ``fit → vectors()`` interface, so
:func:`~ihop_reddit_spark.ml.community2vec.grid_search` and
:class:`~ihop_reddit_spark.app.ClusterExplorer` accept either.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame


@dataclass
class SGNSParams:
    """Defaults mirror the reference Gensim configuration
    (``ihop/community2vec.py:170-218``)."""

    vector_size: int = 150
    negative: int = 20
    alpha: float = 0.025
    min_alpha: float = 0.0001
    epochs: int = 5
    seed: int = 1
    #: SGD minibatch; smaller batches mean more (averaged) steps — on a
    #: tiny vocabulary drop this toward ~128 and raise epochs, since a
    #: batch spanning the whole corpus collapses to one step per epoch
    batch_pairs: int = 1024
    #: refuse to collect absurdly large corpora to the driver
    max_driver_pairs: int = 20_000_000

    def model_id(self) -> str:
        return (
            f"sgns_alpha{self.alpha}_vectorSize{self.vector_size}"
            f"_epochs{self.epochs}_negative{self.negative}"
        )


class SGNSCommunity2Vec:
    """SGNS community2vec with the reference's full-context window:
    every ordered (center, other) pair within a user context is a
    positive example; negatives are drawn from the unigram^0.75 noise
    distribution (word2vec's standard table, Gensim's default).
    """

    def __init__(
        self,
        params: SGNSParams | None = None,
        tokens_col: str = "context",
    ) -> None:
        self.params = params or SGNSParams()
        self.tokens_col = tokens_col
        self.words: list[str] | None = None
        self._w_in: np.ndarray | None = None
        self._spark = None

    # ------------------------------------------------------------------
    def fit(self, contexts: DataFrame) -> "SGNSCommunity2Vec":
        p = self.params
        self._spark = contexts.sparkSession
        # guard BEFORE collecting: count the skip-gram pairs with a
        # distributed aggregate so an oversized corpus raises without
        # first materializing gigabytes on the driver
        from pyspark.sql import functions as F

        sz = F.size(F.col(self.tokens_col)).cast("long")
        est = contexts.agg(
            F.coalesce(F.sum(sz * (sz - 1)), F.lit(0)).alias("n")
        ).collect()[0]["n"]
        if est * max(p.epochs, 1) > p.max_driver_pairs:
            raise ValueError(
                f"{est} pairs x {p.epochs} epochs exceeds the "
                f"driver guard ({p.max_driver_pairs}); use the "
                "distributed Community2Vec trainer"
            )
        rows = [r[0] for r in contexts.select(self.tokens_col).collect()]

        # vocabulary: frequency-desc, lexicographic tie-break — a total
        # order, so the index (and therefore the whole run) is
        # deterministic regardless of partitioning
        counts: dict[str, int] = {}
        for ctx in rows:
            for w in ctx:
                counts[w] = counts.get(w, 0) + 1
        self.words = sorted(counts, key=lambda w: (-counts[w], w))
        index = {w: i for i, w in enumerate(self.words)}
        vocab = len(self.words)
        if vocab == 0:
            raise ValueError("empty corpus")

        # full-context skip-gram pairs (window = whole context)
        centers: list[int] = []
        positives: list[int] = []
        for ctx in rows:
            ids = [index[w] for w in ctx]
            n = len(ids)
            for i in range(n):
                for j in range(n):
                    if i != j:
                        centers.append(ids[i])
                        positives.append(ids[j])
        n_pairs = len(centers)
        if n_pairs == 0:
            raise ValueError("no co-occurrence pairs (1-word contexts)")
        ctr = np.asarray(centers, dtype=np.int64)
        pos = np.asarray(positives, dtype=np.int64)

        # unigram^0.75 noise distribution
        freq = np.asarray(
            [counts[w] for w in self.words], dtype=np.float64
        )
        noise = freq**0.75
        noise /= noise.sum()

        rng = np.random.default_rng(p.seed)
        w_in = (
            rng.random((vocab, p.vector_size)) - 0.5
        ) / p.vector_size
        w_out = np.zeros((vocab, p.vector_size))

        total_batches = max(
            1, p.epochs * ((n_pairs + p.batch_pairs - 1) // p.batch_pairs)
        )
        batch_no = 0
        for _ in range(p.epochs):
            order = rng.permutation(n_pairs)
            for s in range(0, n_pairs, p.batch_pairs):
                sel = order[s : s + p.batch_pairs]
                c, t = ctr[sel], pos[sel]
                b = len(sel)
                neg = rng.choice(
                    vocab, size=(b, p.negative), p=noise
                )
                lr = p.alpha - (p.alpha - p.min_alpha) * (
                    batch_no / total_batches
                )
                batch_no += 1

                v_c = w_in[c]                        # (b, d)
                v_t = w_out[t]                       # (b, d)
                v_n = w_out[neg]                     # (b, k, d)

                # positive: grad coeff = sigma(x) - 1;  negative: sigma(x)
                g_pos = _sigmoid(np.einsum("bd,bd->b", v_c, v_t)) - 1.0
                g_neg = _sigmoid(np.einsum("bd,bkd->bk", v_c, v_n))

                grad_c = g_pos[:, None] * v_t + np.einsum(
                    "bk,bkd->bd", g_neg, v_n
                )
                # scatter-MEAN, not scatter-sum: on a small or skewed
                # vocabulary one batch holds many pairs per word, and
                # summing their sub-gradients multiplies the effective
                # learning rate by the duplication factor — measured
                # divergence to 1e40 norms on a 20-word fixture. The
                # per-index mean matches sequential SGD's step scale
                # while staying fully vectorized.
                _scatter_mean(w_in, c, -lr * grad_c)
                _scatter_mean(w_out, t, -lr * g_pos[:, None] * v_c)
                _scatter_mean(
                    w_out,
                    neg.ravel(),
                    (-lr * g_neg[:, :, None] * v_c[:, None, :]).reshape(
                        -1, p.vector_size
                    ),
                )
        self._w_in = w_in
        return self

    # ------------------------------------------------------------------
    def vectors(self) -> DataFrame:
        """(word STRING, vector array<double>) — interface parity with
        ``Community2Vec.vectors()`` (modulo VectorUDT vs array; both are
        accepted by ``EmbeddingMatrix.from_vectors_df``)."""
        if self._w_in is None:
            raise RuntimeError("call fit() first")
        rows = [
            (w, [float(x) for x in self._w_in[i]])
            for i, w in enumerate(self.words)
        ]
        return self._spark.createDataFrame(
            rows, "word string, vector array<double>"
        )

    def save(self, path: str) -> None:
        """Parquet (word, vector) table + params sidecar — loadable
        without numpy state."""
        self.vectors().write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str, params: SGNSParams | None = None):
        obj = cls(params)
        df = spark.read.parquet(path).orderBy("word")
        rows = df.collect()
        obj.words = [r["word"] for r in rows]
        obj._w_in = np.asarray([r["vector"] for r in rows])
        obj._spark = spark
        return obj


def _scatter_mean(W: np.ndarray, idx: np.ndarray, delta: np.ndarray) -> None:
    """Apply the per-index MEAN of ``delta`` rows to ``W[idx]`` in place
    (duplicate indices average instead of accumulating)."""
    uniq, inv = np.unique(idx, return_inverse=True)
    buf = np.zeros((len(uniq), W.shape[1]), dtype=W.dtype)
    np.add.at(buf, inv, delta)
    cnt = np.bincount(inv).astype(W.dtype)
    W[uniq] += buf / cnt[:, None]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # numerically-stable two-sided form
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out
