"""Training-data operators over the `documents` / `embeddings` tables.

The operations a large-scale training-data pipeline needs, expressed
Ray-Data-first:

- exact dedup: content-hash → partial (per-batch) min/count combiner →
  groupby(hash) final aggregate (the pre-aggregate-then-small-groupby pattern)
- near-dup: char-set Jaccard pairs (SQL-checkable vs DuckDB jaccard()),
  MinHash+LSH band-bucket pipeline, SimHash fingerprints
- similarity search: brute-force cosine top-k (broadcast query matrix,
  per-batch partial top-k, tiny final merge) + LSH-bucketed approximate path
- text analysis: token counts, stopword/quality scores, language-ID
  heuristic, document fingerprints

All scores that feed the DuckDB parity gate use exact-integer or
reproducible-double arithmetic (floor(x*100+0.5) cents, DOUBLE[] cosine).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..functions.arrowutils import from_pandas_clean


def resolve_sf_dir(sf_dir_or_tag: str) -> str:
    if os.path.isdir(sf_dir_or_tag):
        return sf_dir_or_tag
    return os.path.join("/root/testdata", sf_dir_or_tag)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(resolve_sf_dir(sf_dir), "documents.parquet"),
                           columns=columns)


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(resolve_sf_dir(sf_dir), "embeddings.parquet"))


# ---------------------------------------------------------------------------
# exact dedup (partial combiner → groupby aggregate)
# ---------------------------------------------------------------------------


def dedup_exact_ds(sf_dir: str):
    """sha256(text) groups: surviving doc (min id) + multiplicity.

    Pattern: in-batch partial aggregation BEFORE the shuffle — at 100 TB the
    groupby only moves one row per (hash, block)."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["text_sha"] = [hashlib.sha256(x.encode()).hexdigest() for x in df["text"]]
        g = (df.groupby("text_sha", sort=False)
             .agg(keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
             .reset_index())
        g["n_dups"] = g["n_dups"].astype("int64")
        return from_pandas_clean(g)

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("text_sha")
            .aggregate(Min("keep_doc_id", alias_name="keep_doc_id"),
                       Sum("n_dups", alias_name="n_dups")))


# ---------------------------------------------------------------------------
# near-dup: char-set Jaccard pairs within source (SQL-checkable)
# ---------------------------------------------------------------------------


def charset_pairs_ds(sf_dir: str, threshold: float = 0.9):
    """All-pairs character-set Jaccard ≥ threshold within each source group.

    groupby(source).map_groups with a vectorized presence-matrix inner join —
    the 'pairs within a partition key' shape; DuckDB's jaccard() is the oracle
    (identical integer intersection/union → identical doubles)."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id").reset_index(drop=True)
        sets = [set(x) for x in df["text"]]
        vocab = sorted(set().union(*sets)) if sets else []
        idx = {c: i for i, c in enumerate(vocab)}
        m = np.zeros((len(sets), len(vocab)), dtype=np.int64)
        for i, s in enumerate(sets):
            for c in s:
                m[i, idx[c]] = 1
        inter = m @ m.T
        sizes = m.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ii, jj = np.triu_indices(len(sets), k=1)
        keep = np.round(jac[ii, jj], 6) >= threshold
        ids = df["doc_id"].to_numpy()
        return pd.DataFrame({
            "source": df["source"].iloc[0] if len(df) else "",
            "doc_a": ids[ii[keep]], "doc_b": ids[jj[keep]],
            "jac": np.round(jac[ii, jj][keep], 6),
        })

    return (_docs(sf_dir, ["doc_id", "source", "text"])
            .groupby("source")
            .map_groups(pairs, batch_format="pandas"))


# ---------------------------------------------------------------------------
# near-dup: MinHash + LSH (shingle → signature → band buckets → verify)
# ---------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # × 4 rows/band


def minhash_signatures_ds(sf_dir: str):
    """Per-doc MinHash signature (k=64 over 3-word shingles), deterministic."""
    a, b = T.minhash_params(N_HASHES)

    def sig(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sigs, nsh = [], []
        for x in df["text"]:
            sh = T.shingle_hashes(T.tokens_lower(x))
            nsh.append(len(sh))
            sigs.append(T.minhash_signature(sh, a, b).astype("int64"))
        return from_pandas_clean(pd.DataFrame({
            "doc_id": df["doc_id"], "n_shingles": pd.Series(nsh, dtype="int64"),
            "signature": sigs}))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(sig, batch_format="pyarrow")


def minhash_pairs_ds(sf_dir: str, threshold: float = 0.2):
    """LSH candidate pairs → exact shingle-set Jaccard verify.

    Shape: explode (band, band_hash, doc) rows → groupby(band bucket) →
    in-bucket pairwise verify → global pair dedup. Shingle sets ride along to
    the verify stage so no second lookup join is needed."""
    a, b = T.minhash_params(N_HASHES)
    rows_per_band = N_HASHES // N_BANDS

    def explode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = {"band": [], "band_hash": [], "doc_id": [], "shingles": []}
        for x, did in zip(df["text"], df["doc_id"]):
            sh = T.shingle_hashes(T.tokens_lower(x))
            if len(sh) == 0:
                continue
            sig = T.minhash_signature(sh, a, b)
            for bi in range(N_BANDS):
                band = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
                bh = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                out["band"].append(bi)
                out["band_hash"].append(bh)
                out["doc_id"].append(did)
                out["shingles"].append(np.sort(sh).astype("int64"))
        return from_pandas_clean(pd.DataFrame(out))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id").drop_duplicates("doc_id")
        pairs = {"doc_a": [], "doc_b": [], "jaccard": []}
        rows = list(zip(df["doc_id"], df["shingles"]))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                sa, sb = set(rows[i][1].tolist()), set(rows[j][1].tolist())
                u = len(sa | sb)
                jac = len(sa & sb) / u if u else 0.0
                if jac >= threshold:
                    pairs["doc_a"].append(rows[i][0])
                    pairs["doc_b"].append(rows[j][0])
                    pairs["jaccard"].append(round(jac, 6))
        return pd.DataFrame(pairs)

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    cand = (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(explode, batch_format="pyarrow")
            .groupby(["band", "band_hash"])
            .map_groups(verify, batch_format="pandas"))
    # same pair can surface from several bands → exact dedup on the pair key
    return (cand.groupby(["doc_a", "doc_b"])
            .map_groups(dedup_pairs, batch_format="pandas"))


def simhash_ds(sf_dir: str):
    """64-bit SimHash per document (hex) + token count."""

    def sh(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = [T.tokens_lower(x) for x in df["text"]]
        return from_pandas_clean(pd.DataFrame({
            "doc_id": df["doc_id"],
            "simhash": [f"{T.simhash64(tk):016x}" for tk in toks],
            "n_tokens": pd.Series([len(tk) for tk in toks], dtype="int64")}))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(sh, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text analysis (SQL-checkable scores)
# ---------------------------------------------------------------------------


def text_stats_ds(sf_dir: str):
    """Token count, stopword ratio, deterministic quality score per doc."""
    stop = set(T.STOP_EN)

    def stats(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = [T.tokens_lower(x) for x in df["text"]]
        n_tok = np.array([len(tk) for tk in toks], dtype="int64")
        n_stop = np.array([sum(1 for w in tk if w in stop) for tk in toks],
                          dtype="int64")
        with np.errstate(invalid="ignore"):
            ratio = np.where(n_tok > 0, n_stop / np.maximum(n_tok, 1), 0.0)
        quality = (1.0 - ratio) * np.minimum(1.0, n_tok / 200.0)
        return from_pandas_clean(pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars2": df["text"].str.len().astype("int64"),
            "n_tokens": n_tok,
            "n_stop": n_stop,
            "stop_ratio": np.round(ratio, 6),
            "quality": np.round(quality, 6)}))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pyarrow")


def langid_ds(sf_dir: str):
    """Stopword-hit language-ID heuristic (en/de/fr cascade, deterministic)."""
    sets = {"en": set(T.STOP_EN), "de": set(T.STOP_DE), "fr": set(T.STOP_FR)}

    def lid(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = [T.tokens_lower(x) for x in df["text"]]
        hits = {k: np.array([sum(1 for w in tk if w in s) for tk in toks],
                            dtype="int64") for k, s in sets.items()}
        en, de, fr = hits["en"], hits["de"], hits["fr"]
        guess = np.select(
            [(en >= de) & (en >= fr) & (en > 0), (de >= fr) & (de > 0), fr > 0],
            ["en", "de", "fr"], default="unknown")
        return from_pandas_clean(pd.DataFrame({
            "doc_id": df["doc_id"], "en_hits": en, "de_hits": de, "fr_hits": fr,
            "lang_guess": guess.astype(object)}))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(lid, batch_format="pyarrow")


_WS_RE = re.compile(r"\s+")


def fingerprint_ds(sf_dir: str):
    """Normalized-content fingerprint (sha256 of lowercased, whitespace-
    collapsed text) + winnowing rolling-hash sketch (min 5-gram hashes)."""

    def fp(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        norm = [_WS_RE.sub(" ", x.lower()) for x in df["text"]]
        return from_pandas_clean(pd.DataFrame({
            "doc_id": df["doc_id"],
            "fp": [hashlib.sha256(x.encode()).hexdigest()[:16] for x in norm],
            "sketch": [np.array(T.rolling_fingerprints(T.tokens_lower(x)),
                                dtype="int64") for x in df["text"]]}))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

KNN_K = 10
KNN_N_QUERIES = 4


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.values, dtype=np.float64)
    dim = len(vals) // len(batch) if len(batch) else 0
    return vals.reshape(len(batch), dim), np.asarray(batch["vec_id"])


class KnnPartial:
    """Per-batch brute-force cosine against a broadcast query matrix —
    emits each batch's local top-k per query; the final merge is tiny."""

    def __init__(self, q_ref=None, queries=None, k: int = KNN_K):
        import ray

        q = queries if queries is not None else ray.get(q_ref)
        self.qids, self.Q = q
        self.Qn = self.Q / np.linalg.norm(self.Q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        E, ids = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = self.Qn @ En.T  # (n_queries, batch)
        out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
        for qi, qid in enumerate(self.qids):
            s = sims[qi]
            mask = ids != qid
            cand = np.nonzero(mask)[0]
            top = cand[np.argsort(-s[cand], kind="stable")[:self.k]]
            out["query_id"].extend([qid] * len(top))
            out["neighbor_id"].extend(ids[top])
            out["cos_sim"].extend(s[top])
        return from_pandas_clean(pd.DataFrame({
            "query_id": pd.Series(out["query_id"], dtype="int64"),
            "neighbor_id": pd.Series(out["neighbor_id"], dtype="int64"),
            "cos_sim": pd.Series(out["cos_sim"], dtype="float64")}))


def _final_topk(df: pd.DataFrame, k: int = KNN_K) -> pd.DataFrame:
    df = df.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True],
                        kind="stable").head(k).reset_index(drop=True)
    df["rank"] = pd.Series(range(1, len(df) + 1), dtype="int64")
    df["cos_sim"] = df["cos_sim"].round(6)
    return df[["query_id", "neighbor_id", "rank", "cos_sim"]]


def _load_queries(sf_dir: str, n: int = KNN_N_QUERIES):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(resolve_sf_dir(sf_dir), "embeddings.parquet"))
    t = t.filter(pc.less(t["vec_id"], n))
    ids = np.asarray(t["vec_id"])
    Q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, Q


def knn_brute_ds(sf_dir: str):
    """Exact cosine top-k for the first KNN_N_QUERIES vectors (the baseline).

    Broadcast query matrix (ray.put once) → per-batch partial top-k →
    groupby(query_id) final merge. cos computed in float64 (matches DuckDB's
    DOUBLE[] list_cosine_similarity bit-for-bit before rounding)."""
    import ray

    q_ref = ray.put(_load_queries(sf_dir))
    return (_embeddings(sf_dir)
            .map_batches(KnnPartial, batch_format="pyarrow",
                         fn_constructor_kwargs={"q_ref": q_ref},
                         concurrency=(1, 4))
            .groupby("query_id")
            .map_groups(_final_topk, batch_format="pandas"))


def knn_lsh_ds(sf_dir: str, n_planes: int = 6):
    """Approximate variant: random-hyperplane LSH buckets (fixed seed planes);
    each query searches only its bucket — the scale path (bucket groupby
    replaces the full scan; recall traded for a ~2^n_planes fan-in cut)."""
    import ray

    qids, Q = _load_queries(sf_dir)
    rng = np.random.default_rng(11)
    planes: np.ndarray = rng.standard_normal((n_planes, Q.shape[1]))
    qsig = (Q @ planes.T > 0).astype(np.uint8)
    qsig_keys = ["".join(map(str, row)) for row in qsig]
    q_ref = ray.put((qids, Q, planes))

    class BucketPartial(KnnPartial):
        def __init__(self, q_ref=None):
            ids, Qm, pl = ray.get(q_ref)
            super().__init__(queries=(ids, Qm))
            self.planes = pl
            self.qkeys = np.array(qsig_keys)

        def __call__(self, batch: pa.Table) -> pa.Table:
            E, ids = _emb_matrix(batch)
            sig = (E @ self.planes.T > 0).astype(np.uint8)
            keys = np.array(["".join(map(str, row)) for row in sig])
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
            for qi, qid in enumerate(self.qids):
                mask = (keys == self.qkeys[qi]) & (ids != qid)
                cand = np.nonzero(mask)[0]
                if len(cand) == 0:
                    continue
                s = En[cand] @ self.Qn[qi]
                top = cand[np.argsort(-s, kind="stable")[:self.k]]
                out["query_id"].extend([qid] * len(top))
                out["neighbor_id"].extend(ids[top])
                out["cos_sim"].extend(En[top] @ self.Qn[qi])
            return from_pandas_clean(pd.DataFrame({
                "query_id": pd.Series(out["query_id"], dtype="int64"),
                "neighbor_id": pd.Series(out["neighbor_id"], dtype="int64"),
                "cos_sim": pd.Series(out["cos_sim"], dtype="float64")}))

    return (_embeddings(sf_dir)
            .map_batches(BucketPartial, batch_format="pyarrow",
                         fn_constructor_kwargs={"q_ref": q_ref},
                         concurrency=(1, 4))
            .groupby("query_id")
            .map_groups(_final_topk, batch_format="pandas"))
