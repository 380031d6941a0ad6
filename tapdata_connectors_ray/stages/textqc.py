"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Training-data-pipeline extensions (the reference's only text handling is
codec/DDL string work).  Every function here is a stateless ``map_batches``
transform whose semantics are reproduced verbatim by a DuckDB oracle in
``pipelines/training.py`` — tokenizer = single-space split of ``lower(text)``,
regex = RE2-compatible patterns evaluated identically by Python ``re``,
hashes = md5 parity via ``functions/texthash.py``.

Vectorization: pandas ``.str`` kernels (compiled regex under the hood) for
counting; the md5 fingerprint path strides over character grams and is the
one knowingly loop-bound stage (oracle parity requires md5 — a production
deployment swaps in a vectorized rolling hash).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from tapdata_connectors_ray.functions.texthash import TokenHasher

# BPE-ish token regex: letter runs, digit runs, single other non-space chars
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "les", "et", "est", "une"),
}
LANG_PRIORITY = ("en", "de", "es", "fr")  # deterministic tie-break order

QUALITY_STOPWORDS = STOPWORDS["en"]


def _stopword_pattern(words: tuple[str, ...]) -> str:
    """Count pattern equivalent to membership of a single-space split token
    in ``words``: consume the leading boundary (string start or the one
    delimiter space), look ahead at the trailing one.  Adjacent stopwords
    each consume their own leading space, so counts match the split-token
    scan exactly; alternatives are longest-first so 'a' can't shadow 'and';
    ``\\Z`` (not ``$``, which also matches before a trailing newline) keeps
    a token like ``'the\\n'`` a non-match, same as the split scan."""
    alts = "|".join(sorted(map(re.escape, words), key=len, reverse=True))
    return rf"(?:\A| )(?:{alts})(?=[ ]|\Z)"


_QUALITY_STOP_RE = _stopword_pattern(QUALITY_STOPWORDS)
_LANG_STOP_RE = {lang: _stopword_pattern(sws) for lang, sws in STOPWORDS.items()}


def _lower_series(batch: pa.Table) -> pd.Series:
    return pd.Series(batch["text"].to_pylist(), dtype=object).str.lower()


def token_count_batch(batch: pa.Table) -> pa.Table:
    s = _lower_series(batch)
    n_ws = s.str.split(" ").map(len).to_numpy(dtype=np.int64)
    n_bpe = s.str.count(BPE_PATTERN).to_numpy(dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(n_ws, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Length / alpha-ratio / stopword-ratio quality heuristics."""
    raw = pd.Series(batch["text"].to_pylist(), dtype=object)
    low = raw.str.lower()
    n_chars = raw.str.len().to_numpy(dtype=np.int64)
    words = low.str.split(" ")
    n_words = words.map(len).to_numpy(dtype=np.int64)
    alpha = low.str.count("[a-z]").to_numpy(dtype=np.float64)
    stop_hits = low.str.count(_QUALITY_STOP_RE).to_numpy(dtype=np.float64)
    mean_wlen = np.where(n_words > 0, (n_chars - (n_words - 1)) / np.maximum(n_words, 1), 0.0)
    alpha_ratio = np.where(n_chars > 0, alpha / np.maximum(n_chars, 1), 0.0)
    stop_ratio = np.where(n_words > 0, stop_hits / np.maximum(n_words, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            # unrounded IEEE divisions of identical integer operands match the
            # oracle bit-for-bit; the driver rounds both sides at hash time
            "mean_word_len": pa.array(mean_wlen, type=pa.float64()),
            "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
        }
    )


def language_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-frequency language ID with a fixed priority tie-break."""
    low = _lower_series(batch)
    hits = {
        lang: low.str.count(_LANG_STOP_RE[lang]).to_numpy(dtype=np.int64)
        for lang in STOPWORDS
    }
    n = len(low)
    # first lang in priority order reaching the max hit count wins
    maxh = np.maximum.reduce([hits[lang] for lang in LANG_PRIORITY])
    pred = np.full(n, LANG_PRIORITY[-1], dtype=object)
    for lang in reversed(LANG_PRIORITY):
        pred[hits[lang] == maxh] = lang
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(pred, type=pa.string()),
            "stopword_hits": pa.array(maxh, type=pa.int64()),
        }
    )


class Fingerprint:
    """Document fingerprint: min hash over strided character 8-grams of
    ``lower(text)`` (k-min sketch of size 1 — a content-addressed doc key
    stable under trailing-whitespace/window shifts by stride granularity).

    The gram hash is behind the engine/oracle seam: "engine" (default) is
    ONE vectorized SipHash call over the whole batch's gram buffer;
    "oracle" is md5_number_lower so the SQL oracle reproduces values.
    Either way the per-doc min is a single ``np.minimum.reduceat`` segment
    reduction — no per-document Python loop."""

    GRAM = 8
    STRIDE = 4

    def __init__(self, hash_mode: str = "engine") -> None:
        self.hasher = TokenHasher(hash_mode)

    def batch_fingerprints(self, texts: list[str]) -> np.ndarray:
        grams: list[str] = []
        lens = np.empty(len(texts), dtype=np.int64)
        for j, text in enumerate(texts):
            t = text.lower()
            stop = max(len(t) - self.GRAM + 1, 1)
            doc_grams = [t[i : i + self.GRAM] for i in range(0, stop, self.STRIDE)]
            lens[j] = len(doc_grams)
            grams.extend(doc_grams)
        h = self.hasher.many(grams)
        if not len(texts):
            return np.empty(0, dtype=np.uint64)
        starts = np.zeros(len(texts), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        return np.minimum.reduceat(h, starts)

    def fingerprint(self, text: str) -> int:
        return int(self.batch_fingerprints([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = self.batch_fingerprints(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fps, type=pa.uint64()),
            }
        )


REP_TOP_BIGRAM_MAX = 0.07  # Gopher-style repetition gates (rule 4/5 analogue)
REP_DUP_TRIGRAM_MAX = 0.05


def _gram_run_stats(
    texts: list[str], n: int, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc (max occurrence count of any single n-gram, total occurrences
    of n-grams that repeat within the doc, total n-gram count) — one lexsort
    over the positional gram hashes, run-length reductions per doc."""
    from tapdata_connectors_ray.functions.texthash import batch_gram_hashes

    did, gh = batch_gram_hashes(texts, n)
    tot = np.bincount(did, minlength=n_docs).astype(np.int64)
    mx = np.zeros(n_docs, dtype=np.int64)
    dup = np.zeros(n_docs, dtype=np.int64)
    if len(gh):
        order = np.lexsort((gh, did))
        d, g = did[order], gh[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
        starts = np.flatnonzero(new)
        runlen = np.diff(np.append(starts, len(g)))
        np.maximum.at(mx, d[starts], runlen)
        rep = runlen >= 2
        np.add.at(dup, d[starts[rep]], runlen[rep])
    return mx, dup, tot


def repetition_scores_batch(batch: pa.Table) -> pa.Table:
    """Intra-document repetition metrics (Gopher quality rules, adapted to
    the single-line fixture texts): fraction of bigram slots taken by the
    most frequent bigram, and fraction of trigram slots whose trigram occurs
    more than once in the doc.  ``keep`` applies both gates.  Ratios are raw
    IEEE divisions of identical integer operands on both engines."""
    texts = batch["text"].to_pylist()
    n_docs = len(texts)
    mx2, _, tot2 = _gram_run_stats(texts, 2, n_docs)
    _, dup3, tot3 = _gram_run_stats(texts, 3, n_docs)
    top_bi = np.where(tot2 > 0, mx2 / np.maximum(tot2, 1), 0.0)
    dup_tri = np.where(tot3 > 0, dup3 / np.maximum(tot3, 1), 0.0)
    keep = ((top_bi <= REP_TOP_BIGRAM_MAX) & (dup_tri <= REP_DUP_TRIGRAM_MAX)).astype(
        np.int64
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "top_bigram_frac": pa.array(top_bi, type=pa.float64()),
            "dup_trigram_frac": pa.array(dup_tri, type=pa.float64()),
            "keep": pa.array(keep, type=pa.int64()),
        }
    )


DECONTAM_NGRAM = 3
EVAL_HOLDOUT_MOD = 97  # doc_id % 97 == 0 plays the benchmark/eval split


def eval_gram_partials(batch: pa.Table) -> pa.Table:
    """Per-block distinct gram hashes of the EVAL holdout docs (narrow,
    benchmark-suite-scale output — the small side of the broadcast)."""
    from tapdata_connectors_ray.functions.texthash import batch_distinct_gram_hashes

    ids = batch["doc_id"].to_numpy()
    mask = ids % EVAL_HOLDOUT_MOD == 0
    if mask.any():
        texts = batch.filter(pa.array(mask))["text"].to_pylist()
        gh, _ = batch_distinct_gram_hashes(texts, DECONTAM_NGRAM)
        gh = np.unique(gh)
    else:
        gh = np.empty(0, dtype=np.uint64)
    return pa.table({"gh": pa.array(gh, type=pa.uint64())})


def make_decontaminate(eval_ref, n: int = DECONTAM_NGRAM):
    """Corpus-side decontamination kernel: count each non-eval doc's distinct
    word n-grams that appear anywhere in the broadcast eval gram set (GPT-3 /
    Pile-style benchmark-overlap filter).  The eval set rides the object
    store once (``ray.put``); membership is a searchsorted against the
    sorted hash array — no shuffle touches the corpus."""
    import ray

    def f(batch: pa.Table) -> pa.Table:
        from tapdata_connectors_ray.functions.texthash import (
            batch_distinct_gram_hashes,
        )

        ev = ray.get(eval_ref)
        ids = batch["doc_id"].to_numpy()
        sub = batch.filter(pa.array(ids % EVAL_HOLDOUT_MOD != 0))
        ids = sub["doc_id"].to_numpy()
        texts = sub["text"].to_pylist()
        gh, counts = batch_distinct_gram_hashes(texts, n)
        n_shared = np.zeros(len(texts), dtype=np.int64)
        if len(ev) and len(gh):
            idx = np.minimum(np.searchsorted(ev, gh), len(ev) - 1)
            member = ev[idx] == gh
            did = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
            n_shared = np.bincount(
                did[member], minlength=len(texts)
            ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_shared": pa.array(n_shared, type=pa.int64()),
                "contaminated": pa.array((n_shared > 0).astype(np.int64)),
            }
        )

    return f


CHUNK_TOKENS = 64


def chunk_documents_batch(batch: pa.Table, window: int = CHUNK_TOKENS) -> pa.Table:
    """Fixed-window document CHUNKING — the sequence-prep step of an LLM
    training pipeline (split each doc into ``window``-token pieces at
    whitespace-token boundaries, document boundaries never crossed).

    Fully vectorized via flattened token lengths + ``np.add.reduceat`` at
    the chunk cut points — no per-row or per-chunk Python.  Emits one row
    per chunk: (doc_id, chunk_idx, n_tokens, n_chars), where ``n_chars``
    is the length of the space-rejoined chunk (== the matching substring of
    the original text, single-space separators preserved by the split/join
    round trip)."""
    low = _lower_series(batch)
    tokens = low.str.split(" ")
    n_tok = tokens.map(len).to_numpy(dtype=np.int64)
    ids = batch["doc_id"].to_numpy()

    # flat token lengths across the batch + per-doc offsets
    flat_lens = np.fromiter(
        (len(t) for toks in tokens for t in toks), dtype=np.int64, count=int(n_tok.sum())
    )
    doc_starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])

    k = (n_tok + window - 1) // window  # chunks per doc (>=1: empty text -> [''])
    doc_rep = np.repeat(np.arange(len(ids)), k)
    # chunk_idx within doc: ranges 0..k_i-1, vectorized
    chunk_idx = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
    cut = doc_starts[doc_rep] + chunk_idx * window  # flat start of each chunk
    n_in_chunk = np.minimum(n_tok[doc_rep] - chunk_idx * window, window)
    # per-chunk char sums at the cut points (reduceat needs sorted cuts — they are)
    char_sums = (
        np.add.reduceat(flat_lens, cut) if len(flat_lens) else np.zeros(0, np.int64)
    )
    n_chars = char_sums + (n_in_chunk - 1)  # (count-1) single-space separators
    return pa.table(
        {
            "doc_id": pa.array(ids[doc_rep], type=pa.int64()),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "n_tokens": pa.array(n_in_chunk, type=pa.int64()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
        }
    )


def doc_token_counts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens) — the narrow input of the packing prefix-sum."""
    low = _lower_series(batch)
    n = low.str.split(" ").map(len).to_numpy(dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(batch["doc_id"].to_numpy(), pa.int64()),
            "n": pa.array(n, pa.int64()),
        }
    )


def pack_block_meta(batch: pa.Table) -> pa.Table:
    """Per-block (first doc_id, token sum) — the tiny frame the driver turns
    into per-block prefix offsets (a distributed prefix-sum in two passes)."""
    ids = batch["doc_id"].to_numpy()
    return pa.table(
        {
            "first_doc": pa.array([int(ids[0])] if len(ids) else [], pa.int64()),
            "block_tokens": pa.array(
                [int(batch["n"].to_numpy().sum())] if len(ids) else [], pa.int64()
            ),
        }
    )


def make_pack_expand(prefix_ref, window: int):
    """map_batches fn over the doc_id-sorted counts: resolve this block's
    global token offset from the broadcast per-block prefix map, then emit
    one row per (sequence, doc) overlap — vectorized repeat/range, the same
    shape as the chunk expansion."""

    def f(batch: pa.Table) -> pa.Table:
        import ray as _ray

        empty = pa.table(
            {
                "seq_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "tok": pa.array([], pa.int64()),
                "sbucket": pa.array([], pa.int32()),
            }
        )
        ids = batch["doc_id"].to_numpy()
        if not len(ids):
            return empty
        prefix = _ray.get(prefix_ref)
        n = batch["n"].to_numpy()
        start = int(prefix[int(ids[0])]) + np.cumsum(n) - n  # global offsets
        first_seq = start // window
        last_seq = (start + n - 1) // window
        k = (last_seq - first_seq + 1).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(ids)), k)
        seq_off = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
        seq = first_seq[doc_rep] + seq_off
        lo = np.maximum(start[doc_rep], seq * window)
        hi = np.minimum(start[doc_rep] + n[doc_rep], (seq + 1) * window)
        return pa.table(
            {
                "seq_id": pa.array(seq, pa.int64()),
                "doc_id": pa.array(ids[doc_rep], pa.int64()),
                "tok": pa.array(hi - lo, pa.int64()),
                "sbucket": pa.array((seq % 256).astype(np.int32)),
            }
        )

    return f


def pack_fold(df) -> pa.Table:
    """One seq bucket: per-sequence doc count + token sum (a sequence lives
    wholly in its bucket, so the fold is exact)."""
    g = df.groupby("seq_id", sort=False).agg(
        n_docs=("doc_id", "size"), n_tokens=("tok", "sum")
    )
    return pa.table(
        {
            "seq_id": pa.array(g.index.to_numpy(), pa.int64()),
            "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(), pa.int64()),
        }
    )


# -- hashed-feature linear quality classifier (fasttext-style filter shape) --

CLS_BUCKETS = 4096
CLS_MULT = 2654435761  # Knuth multiplicative constant — the deterministic "model"


class QualityClassifier:
    """Hashed bag-of-words LINEAR SCORER — the model-based quality-filter
    shape (fasttext/logistic filters in CCNet/GPT-3-style curation):
    whitespace token -> feature bucket = token_hash % ``CLS_BUCKETS``,
    doc score = sum of per-bucket weights.

    The weight table here derives from the bucket index
    (``w_b = (b * CLS_MULT) % 1000 - 500``, integer milli-units) so the SQL
    oracle reproduces SCORES bit-for-bit; a trained model is the SAME dot
    product with a broadcast weight vector — ``ray.put`` the trained array
    once and resolve it here in ``__init__`` (once per actor, never per
    batch).  Integer milli-unit sums are exact and order-independent, so
    the distributed score can never drift from the oracle by float
    association.  Docs with zero non-empty tokens emit no row (mirroring
    the oracle's ``tok <> ''`` filter + GROUP BY).  Token hash behind the
    engine/oracle seam (engine = one vectorized call per batch)."""

    def __init__(self, hash_mode: str = "engine", weights=None) -> None:
        self.hasher = TokenHasher(hash_mode)
        if weights is None:
            b = np.arange(CLS_BUCKETS, dtype=np.uint64)
            self.weights = (
                (b * np.uint64(CLS_MULT)) % np.uint64(1000)
            ).astype(np.int64) - 500
        else:
            # trained-model path: an ObjectRef broadcasts ONE copy per node
            # (resolved here, once per actor), a plain array ships pickled
            import ray as _ray

            if isinstance(weights, _ray.ObjectRef):
                weights = _ray.get(weights)
            self.weights = np.asarray(weights, dtype=np.int64)
            if len(self.weights) != CLS_BUCKETS:
                raise ValueError(
                    f"weight table must have {CLS_BUCKETS} buckets, "
                    f"got {len(self.weights)}"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_feats": pa.array([], pa.int64()),
                "score_milli": pa.array([], pa.int64()),
                "keep_flag": pa.array([], pa.int64()),
            }
        )
        ids = batch["doc_id"].to_numpy() if batch.num_rows else np.empty(0)
        if not len(ids):
            return empty
        toks = _lower_series(batch).fillna("").str.split(" ")
        n_tok = toks.map(len).to_numpy(dtype=np.int64)  # always >= 1
        flat = np.asarray([t for ts in toks for t in ts], dtype=object)
        h = self.hasher.many(flat)
        w = self.weights[(h % np.uint64(CLS_BUCKETS)).astype(np.int64)]
        feat = flat != ""  # empty split artifacts are not features
        w = np.where(feat, w, 0)
        starts = np.zeros(len(ids), dtype=np.int64)
        starts[1:] = np.cumsum(n_tok)[:-1]
        score = np.add.reduceat(w, starts)
        n_feats = np.add.reduceat(feat.astype(np.int64), starts)
        m = n_feats > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[m], pa.int64()),
                "n_feats": pa.array(n_feats[m], pa.int64()),
                "score_milli": pa.array(score[m], pa.int64()),
                "keep_flag": pa.array((score[m] > 0).astype(np.int64), pa.int64()),
            }
        )
