"""Corpus/statistics operators: group-wise z-score normalization,
stratified sampling, and term document-frequency analysis.

Training-data-pipeline extensions (the brief's §text-analysis family)
over the driver's `events` / `documents` tables.  Every operator here
is gated by a DuckDB oracle; the float-bearing one (z-score) follows
the repo's bit-reproducibility discipline: all aggregation happens in
EXACT int64 partials and the only float ops (int->double cast, divide,
sqrt, multiply, +0.5, floor) are IEEE-exactly-rounded, so numpy and
DuckDB produce the identical scaled-integer output.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# group-wise z-score normalization
# ---------------------------------------------------------------------------
#
# Semantics: per event_type, z = (x - mean) / stddev_pop over the
# integerized value v = floor(value * 100).  The closed form
#     z = (n*v - s) / sqrt(n*q - s^2)      (n, s=Σv, q=Σv² per group)
# avoids every non-reproducible float aggregate: n, s, q are exact
# int64 sums (DuckDB: hugeint), and the remaining expression is a
# fixed-order chain of IEEE-exact ops.  Output is z_micro =
# floor(z*1e6 + 0.5) as int64 (NULL when the group variance is 0).
#
# Scale note: int64 partials hold to ~sf0.1 world sizes here
# (n*q <= ~1e18); the 100-TB path keeps per-PARTITION partials in
# int64 and merges in int128/float128 — or rescales v — before the
# final tiny per-group division.


def _zscore_partials(batch: pa.Table) -> pa.Table:
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    val = batch.column("value").to_numpy(zero_copy_only=False)
    ok = np.isfinite(val)
    if not ok.all():
        et, val = et[ok], val[ok]
    v = np.floor(val * 100.0).astype(np.int64)
    keys, inv = np.unique(et, return_inverse=True)
    n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
    s = np.zeros(len(keys), dtype=np.int64)
    q = np.zeros(len(keys), dtype=np.int64)
    np.add.at(s, inv, v)
    np.add.at(q, inv, v * v)
    return pa.table(
        {
            "event_type": pa.array(keys.tolist(), type=pa.string()),
            "n": pa.array(n, type=pa.int64()),
            "s": pa.array(s, type=pa.int64()),
            "q": pa.array(q, type=pa.int64()),
        }
    )


def q_group_zscore(sf_dir: str):
    """Two-pass plan: (1) per-batch exact int64 partials -> tiny
    groupby-sum (cardinality = event-type vocabulary) broadcast via
    ray.put; (2) second streaming pass joins each row against its
    group's (n, s, q) and emits the scaled z.  Nothing row-scaled ever
    lands on the driver."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/events.parquet"
    stats_rows = (
        rd.read_parquet(path, columns=["event_type", "value"])
        .map_batches(_zscore_partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum(on="n", alias_name="n"),
            Sum(on="s", alias_name="s"),
            Sum(on="q", alias_name="q"),
        )
        .take_all()  # event-type vocabulary — driver-small
    )
    kt = np.array([r["event_type"] for r in stats_rows], dtype=object)
    order = np.argsort(kt, kind="stable")
    kt = kt[order]
    kn = np.array([int(stats_rows[i]["n"]) for i in order], dtype=np.int64)
    ks = np.array([int(stats_rows[i]["s"]) for i in order], dtype=np.int64)
    kq = np.array([int(stats_rows[i]["q"]) for i in order], dtype=np.int64)
    stats_ref = ray.put((kt, kn, ks, kq))

    def zmap(batch: pa.Table) -> pa.Table:
        kt, kn, ks, kq = ray.get(stats_ref)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        ok = np.isfinite(val)
        if not ok.all():
            batch = batch.filter(pa.array(ok))
            et, val = et[ok], val[ok]
        gi = np.searchsorted(kt, et)
        v = np.floor(val * 100.0).astype(np.int64)
        n, s, q = kn[gi], ks[gi], kq[gi]
        # numpy int64 wraps silently where DuckDB's hugeint stays exact;
        # fail loudly instead of diverging (preflight in float headroom)
        if len(n) and max(
            float(np.max(np.abs(n.astype(np.float64) * q.astype(np.float64)))),
            float(np.max(s.astype(np.float64) * s.astype(np.float64))),
        ) > 2.0**62:
            raise ValueError(
                "group_zscore int64 partial overflow: rescale v or switch the merge to int128"
            )
        den_i = n * q - s * s
        num = (n * v - s).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = num / np.sqrt(den_i.astype(np.float64))
        zm = np.floor(z * 1e6 + 0.5)
        valid = den_i != 0
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "z_micro": pa.array(
                    np.where(valid, zm, 0.0).astype(np.int64), type=pa.int64(), mask=~valid
                ),
            }
        )

    return rd.read_parquet(path, columns=["event_id", "event_type", "value"]).map_batches(
        zmap, batch_format="pyarrow"
    )


SQL_GROUP_ZSCORE = """
WITH v AS (
  SELECT event_id, event_type, CAST(floor(value * 100.0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
st AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS q
  FROM v GROUP BY event_type)
SELECT v.event_id, v.event_type,
       CASE WHEN st.n * st.q - st.s * st.s = 0 THEN NULL
            ELSE CAST(floor(
                   CAST(st.n * v.v - st.s AS DOUBLE)
                   / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE))
                   * 1e6 + 0.5) AS BIGINT)
       END AS z_micro
FROM v JOIN st USING (event_type)
"""


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------
#
# Deterministic per-stratum quota sample: the K docs per language with
# the smallest md5(doc_id) — a reshard-stable, engine-independent
# "random" sample (the train_split hashing discipline, SURVEY.md §2.6).

STRATified_K = 20


def q_stratified_sample(sf_dir: str):
    """Per-batch partial bottom-K per lang (shrinks the shuffle to
    <= K rows/lang/batch), then a per-lang merge keeps the global
    bottom-K by (md5 hex, doc_id)."""
    import hashlib

    import ray.data as rd

    K = STRATified_K

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hx = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "hx": pa.array(hx, type=pa.string()),
            }
        )

    def partial_bottomk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        enc = pc.dictionary_encode(batch.column("lang").combine_chunks())
        g = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hx = np.asarray(batch.column("hx").to_pylist(), dtype=object)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, hx, g))
        gs = g[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        starts = np.nonzero(first)[0]
        rank = np.arange(len(gs)) - np.repeat(starts, np.diff(np.append(starts, len(gs))))
        keep = order[rank < K]
        return batch.take(pa.array(np.sort(keep), type=pa.int64()))

    def final_bottomk(grp: pa.Table) -> pa.Table:
        hx = np.asarray(grp.column("hx").to_pylist(), dtype=object)
        did = grp.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, hx))[:K]
        out = grp.take(pa.array(order, type=pa.int64()))
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "lang": out.column("lang"),
                "rk": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return (
        ds.map_batches(hashed, batch_format="pyarrow")
        .map_batches(partial_bottomk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_bottomk, batch_format="pyarrow")
    )


SQL_STRATIFIED_SAMPLE = f"""
WITH h AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS rk
  FROM h)
SELECT doc_id, lang, rk FROM r WHERE rk <= {STRATified_K}
"""


# ---------------------------------------------------------------------------
# term document frequency (vocabulary analysis)
# ---------------------------------------------------------------------------
#
# Per language: the TOP_TERMS terms with the highest document frequency
# (#docs containing the term; ties -> lexicographically smaller term).
# The distributed shape is the canonical inverted-vocabulary build:
# per-batch distinct (lang, term, partial df) -> groupby sum ->
# per-lang top-k.  All counts are ints; fully oracle-exact.

TOP_TERMS = 10
_TERM_RE = re.compile(r"[^a-z]+")


def _term_partials(batch: pa.Table) -> pa.Table:
    """(lang, text) rows -> per-batch partial (lang, term, df) counts,
    fully vectorized: Arrow lower + regex split, flatten with a
    repeated doc index, dictionary-encode terms to int codes, then
    distinct (doc, code) pairs and a (lang-code, term-code) unique
    count — no per-row Python (``_TERM_RE`` documents the same
    tokenizer rule for brute-force tests)."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "lang": pa.array([], type=pa.string()),
            "term": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
        }
    )
    text = batch.column("text").combine_chunks()
    lang = batch.column("lang").combine_chunks()
    valid = pc.is_valid(text)
    if not pc.all(valid).as_py():
        text = text.filter(valid)
        lang = lang.filter(valid)
    if len(text) == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(text), _TERM_RE.pattern)
    flat = pc.list_flatten(toks)
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.any():
        return empty
    enc = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = doc_of[nonempty]
    vocab = enc.dictionary
    nv = len(vocab)
    pair = np.unique(doc_of * nv + codes)  # distinct (doc, term)
    p_doc = pair // nv
    p_code = pair % nv
    lenc = pc.dictionary_encode(lang)
    lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[p_doc]
    uniq, cnt = np.unique(lcodes * nv + p_code, return_counts=True)
    return pa.table(
        {
            "lang": lenc.dictionary.take(pa.array(uniq // nv, type=pa.int64())),
            "term": vocab.take(pa.array(uniq % nv, type=pa.int64())),
            "df": pa.array(cnt.astype(np.int64), type=pa.int64()),
        }
    )


def q_term_df(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def final_topk(grp: pa.Table) -> pa.Table:
        df = grp.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(grp.column("term").to_pylist(), dtype=object)
        order = np.lexsort((terms, -df))[:TOP_TERMS]
        out = grp.take(pa.array(order, type=pa.int64()))
        return pa.table(
            {
                "lang": out.column("lang"),
                "term": out.column("term"),
                "df": out.column("df"),
                "rk": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return (
        ds.map_batches(_term_partials, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum(on="df", alias_name="df"))
        .groupby("lang")
        .map_groups(final_topk, batch_format="pyarrow")
    )


SQL_TERM_DF = f"""
WITH terms AS (
  SELECT DISTINCT doc_id, lang,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents),
df AS (
  SELECT lang, term, COUNT(*) AS df FROM terms
  WHERE term <> '' GROUP BY lang, term),
r AS (
  SELECT lang, term, df,
         row_number() OVER (PARTITION BY lang ORDER BY df DESC, term ASC) AS rk
  FROM df)
SELECT lang, term, df, rk FROM r WHERE rk <= {TOP_TERMS}
"""


# ---------------------------------------------------------------------------
# quality filtering (per-group percentile threshold)
# ---------------------------------------------------------------------------
#
# Keep the documents whose n_chars exceeds their language's discrete
# median — the classic per-stratum quality-threshold pass of a
# training-data pipeline.  Exact-median plan for an INTEGER metric:
# one distributed (lang, n_chars) count groupby (bounded by #langs x
# #distinct lengths, NOT by row count), driver-side rank walk over the
# tiny count table, threshold broadcast, streaming filter pass.  The
# rank rule is quantile_disc's ceil(q*n)-1 (== floor((n-1)/2) at
# q=0.5), matching the grouped_median family bit-for-bit.


def q_quality_filter(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    path = f"{sf_dir}/documents.parquet"
    counts = (
        rd.read_parquet(path, columns=["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="cnt"))
        .take_all()  # #langs x #distinct lengths — value-domain-bounded
    )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in counts:  # one pass, not a rescan per language
        if r["n_chars"] is not None:
            by_lang.setdefault(r["lang"], []).append((r["n_chars"], r["cnt"]))
    med: dict[str, int] = {}
    for lang, rows in by_lang.items():
        rows.sort()
        total = sum(c for _, c in rows)
        target = (total - 1) // 2  # 0-based rank of the discrete median
        cum = 0
        for v, c in rows:
            cum += c
            if cum > target:
                med[lang] = v
                break
    med_ref = ray.put(med)

    def keep_above(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        thr = np.array([m.get(v, np.iinfo(np.int64).max) for v in lang], dtype=np.int64)
        mask = np.asarray(nc > thr)
        return batch.filter(pa.array(mask))

    return rd.read_parquet(path, columns=["doc_id", "lang", "n_chars"]).map_batches(
        keep_above, batch_format="pyarrow"
    )


SQL_QUALITY_FILTER = """
WITH med AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN med USING (lang)
WHERE d.n_chars > med.med
"""


# ---------------------------------------------------------------------------
# anti-join: content-unique documents
# ---------------------------------------------------------------------------
#
# The complement of exact dedup: documents whose normalized content
# hash has NO duplicate partner (the "survivors without siblings"
# pass a training-data pipeline runs before expensive near-dup work).
# Distributed anti-join shape: per-batch partial (hash, count) -> tiny
# groupby sum over realized hashes -> the n >= 2 hash set anti-joins
# the docs stream.  Mirrors q_dedup_exact's md5(text) content key so
# both gates share one definition of "identical content".  The dup-hash
# set grows with the corpus DUP MASS, which a boilerplate-heavy 100-TB
# corpus does not bound — so the plan switches adaptively on measured
# size (the minhash pattern): below the bound the sorted hash array is
# ray.put-broadcast and membership is a vectorized is_in; above it the
# hashed stream LEFT_ANTI-joins the dup set via the native
# ``Dataset.join`` and nothing hash-set-sized is ever driver-resident.
# Both paths are parity-tested (tests/test_trainingdata.py).

UNIQUE_DOCS_BROADCAST_MAX = 1_000_000  # dup md5 hex strings ~ 32 MB


def q_unique_docs(sf_dir: str, _broadcast_max: int | None = None):
    import hashlib

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .poolsize import auto_pool

    bound = UNIQUE_DOCS_BROADCAST_MAX if _broadcast_max is None else _broadcast_max
    path = f"{sf_dir}/documents.parquet"

    def hashed(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hx = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "hx": pa.array(hx, type=pa.string())}
        )

    hashed_ds = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        hashed, batch_format="pyarrow"
    ).materialize()  # consumed by the count pass and the anti-join pass
    counts = hashed_ds.groupby("hx").aggregate(Count(alias_name="n"))
    dup = counts.filter(expr="n >= 2").select_columns(["hx"]).materialize()

    if dup.count() <= bound:
        # BROADCAST plan: dup set is measured-small — ship once, filter
        # with a vectorized is_in per batch.
        dup_arr = pa.array(sorted(r["hx"] for r in dup.take_all()), type=pa.string())
        dup_ref = ray.put(dup_arr)

        def keep_unique(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            dups = ray.get(dup_ref)
            mask = pc.invert(pc.is_in(batch.column("hx"), value_set=dups))
            return batch.filter(mask).select(["doc_id"])

        out = hashed_ds.map_batches(keep_unique, batch_format="pyarrow")
    else:
        # DISTRIBUTED plan: native left_anti join keeps the dup set in
        # worker blocks (the q_orders_no_lineitem shape).
        out = hashed_ds.join(
            dup, join_type="left_anti", num_partitions=auto_pool(), on=("hx",)
        ).select_columns(["doc_id"])
    return out


SQL_UNIQUE_DOCS = """
SELECT doc_id FROM documents
QUALIFY COUNT(*) OVER (PARTITION BY md5(text)) = 1
"""


# ---------------------------------------------------------------------------
# one-pass mergeable sketches (approximate scale paths; rows-only)
# ---------------------------------------------------------------------------
#
# The bounded-state companions to the exact operators: grouped_quantile
# re-scans per refinement level and term_df carries the vocabulary;
# these answer in ONE pass with fixed state and self-reported error
# bounds.  Both deterministic — no sampling — so reshard-stable.

SKETCH_QS = [0.5, 0.9, 0.99]
HH_K = 32
_HH_TOTAL = "\x00total"  # sentinel term carrying the processed-token count


def q_quantile_sketch(sf_dir: str):
    """Per-event-type p50/p90/p99 in one pass: per-batch sparse
    (event_type, bin, n) histogram partials over the order-preserving
    16-bit key -> groupby sum (rows bounded by #types x occupied bins,
    a data-independent 2^16 cap per type) -> per-type finalize.  Each
    estimate is a real bin edge and ships its own rank-error bound
    (the bin's occupancy)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from geocoding_ray.stages.sketch import N_BINS, quantile_from_histogram, u16_bin

    def partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        ok = np.isfinite(val)
        et, val = et[ok], val[ok]
        types, codes = np.unique(et, return_inverse=True)
        key = codes.astype(np.int64) * N_BINS + u16_bin(val)
        uk, n = np.unique(key, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[(uk // N_BINS)].tolist(), type=pa.string()),
                "bin": pa.array(uk % N_BINS, type=pa.int64()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        bins = group.column("bin").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        counts = np.zeros(N_BINS, dtype=np.int64)
        counts[bins] = n
        ests = quantile_from_histogram(counts, SKETCH_QS)
        cols: dict[str, object] = {"event_type": group.column("event_type").slice(0, 1)}
        for q, (est, err) in zip(SKETCH_QS, ests):
            tag = str(int(q * 100))
            cols[f"p{tag}_est"] = pa.array([est], type=pa.float64())
            cols[f"p{tag}_rank_err"] = pa.array([err], type=pa.int64())
        return pa.table(cols)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum(on="n", alias_name="n"))
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries top words over the corpus: per-batch exact counts
    compressed to <= HH_K counters (plus one sentinel row carrying the
    batch token count) -> groupby(term) Sum (<= HH_K x #blocks slim
    rows, the 'sum counters' half of MG merge) -> one final compress.
    Reported counts are under-estimates by at most n_total/(HH_K+1),
    and every term above that threshold is guaranteed present
    (mergeable-summaries bound)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from geocoding_ray.stages.sketch import misra_gries

    def partials(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column("text").combine_chunks(), " ")
        wa = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = wa.values
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        terms, kept = misra_gries(vocab, cnt, HH_K)
        return pa.table(
            {
                "term": pa.array(list(terms) + [_HH_TOTAL], type=pa.string()),
                "cnt": pa.array(np.concatenate([kept, [len(flat)]]), type=pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        is_total = terms == _HH_TOTAL
        n_total = int(cnt[is_total].sum())
        t, c = misra_gries(terms[~is_total], cnt[~is_total], HH_K)
        order = np.argsort(-c, kind="stable")
        return pa.table(
            {
                "term": pa.array(t[order].tolist(), type=pa.string()),
                "mg_count": pa.array(c[order], type=pa.int64()),
                "n_total": pa.array(np.full(len(t), n_total), type=pa.int64()),
                "undercount_bound": pa.array(
                    np.full(len(t), n_total // (HH_K + 1)), type=pa.int64()
                ),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    summed = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )
    # final compress: one task over <= HH_K x #blocks + #blocks slim rows
    return summed.repartition(1).map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# correlation / covariance partials (two-variable exact statistics)
# ---------------------------------------------------------------------------
#
# The COVAR/CORR aggregate family, reproducibility-first: the engine
# never emits the float statistic from a distributed reduction (float
# summation order is engine-defined); it emits the six EXACT int64
# moment sums per group — n, Σx, Σy, Σxy, Σx², Σy² over integerized
# (cents) values — from which covariance/correlation are one fixed-order
# scalar expression away.  DuckDB reproduces the sums in hugeint and
# casts down, so the gate is bit-exact; the float corr itself is
# asserted against numpy in tests (driver-side, #groups rows).


def q_corr_moments(sf_dir: str):
    """Per (l_returnflag): exact moment sums of x = quantity cents,
    y = extendedprice cents over lineitem.  Per-batch vectorized
    partials -> slim groupby Sum merge; int64 ranges hold to sf-scale
    (Σy² <= ~6e18 at sf0.1; the 100-TB path splits Σy² into hi/lo
    int64 limbs or rescales, same as the zscore note)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        x = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        y = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keys, inv = np.unique(rf, return_inverse=True)
        out: dict[str, object] = {"l_returnflag": pa.array(keys.tolist(), type=pa.string())}
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        out["n"] = pa.array(n, type=pa.int64())
        for name, v in (("sx", x), ("sy", y), ("sxy", x * y), ("sxx", x * x), ("syy", y * y)):
            acc = np.zeros(len(keys), dtype=np.int64)
            np.add.at(acc, inv, v)
            out[name] = pa.array(acc, type=pa.int64())
        return pa.table(out)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum(on="n", alias_name="n"),
            Sum(on="sx", alias_name="sx"),
            Sum(on="sy", alias_name="sy"),
            Sum(on="sxy", alias_name="sxy"),
            Sum(on="sxx", alias_name="sxx"),
            Sum(on="syy", alias_name="syy"),
        )
    )


def corr_from_moments(n: int, sx: int, sy: int, sxy: int, sxx: int, syy: int) -> float | None:
    """Pearson r from exact integer moments, arbitrary-precision until
    the final float division (Python ints never overflow)."""
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx == 0 or vy == 0:
        return None
    import math

    return num / math.sqrt(vx) / math.sqrt(vy)


SQL_CORR_MOMENTS = """
WITH v AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 100.0) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS y
  FROM lineitem)
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sx,
       CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x * y) AS BIGINT) AS sxy,
       CAST(SUM(x * x) AS BIGINT) AS sxx,
       CAST(SUM(y * y) AS BIGINT) AS syy
FROM v GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# per-label embedding centroids (vector-column aggregate)
# ---------------------------------------------------------------------------
#
# The vector-aggregate shape every embedding pipeline needs (class
# centroids, cluster updates, prototype vectors): mean per label over a
# list<float> column.  Reproducibility-first like every float aggregate
# here: components are integerized (floor(x * 1e6), exact in float64
# for |x| < ~4e9) so the distributed sums are exact int64; the float
# centroid is sum_e6 / (n * 1e6) derived at the edge.  The shuffle
# carries #labels x dim x #blocks slim rows — never the vectors.

CENTROID_SCALE = 1_000_000


def q_label_centroids(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        widths = np.diff(offs)
        dim = int(widths[0]) if len(widths) else 0
        assert (widths == dim).all(), "embedding column must be fixed-width"
        # zero-copy component view -> exact integerization in float64
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(flat * float(CENTROID_SCALE)).astype(np.int64).reshape(-1, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(keys), dim), dtype=np.int64)
        np.add.at(sums, inv, e6)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        k = len(keys)
        return pa.table(
            {
                "label": pa.array(np.repeat(keys, dim), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k), type=pa.int64()),
                "sum_e6": pa.array(sums.ravel(), type=pa.int64()),
                "n": pa.array(np.repeat(n, dim), type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum(on="sum_e6", alias_name="sum_e6"), Sum(on="n", alias_name="n"))
    )


SQL_LABEL_CENTROIDS = f"""
WITH x AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {CENTROID_SCALE}.0) AS BIGINT) AS e6
  FROM embeddings)
SELECT label, dim,
       CAST(SUM(e6) AS BIGINT) AS sum_e6,
       COUNT(*) AS n
FROM x GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# weighted priority sampling (sequential-Poisson shape)
# ---------------------------------------------------------------------------
#
# Weighted sampling without replacement, deterministic and
# reshard-stable: each doc gets priority p = u // w where u is a
# 32-bit md5-derived uniform and w its weight (n_chars) — Ohlsson's
# sequential Poisson sampling with integer-quantized priorities, so
# both engines compute the IDENTICAL priorities (no libm pow/log) and
# the sample is the exact bottom-K.  Higher weight => smaller expected
# priority => higher inclusion probability (~proportional for
# w << 2^32).

WSAMPLE_K = 50


def q_weighted_sample(sf_dir: str):
    import hashlib

    import ray.data as rd

    def pri(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        u = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids),
            dtype=np.int64,
            count=len(ids),
        )
        w = np.maximum(
            batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64), 1
        )
        p = u // w
        # partial bottom-K: only K candidates per batch cross the exchange
        order = np.lexsort((np.asarray(ids, dtype=np.int64), p))[: WSAMPLE_K]
        take = pa.array(order)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(take),
                "n_chars": batch.column("n_chars").take(take),
                "p": pa.array(p[order], type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return ds.map_batches(pri, batch_format="pyarrow").sort(["p", "doc_id"]).limit(WSAMPLE_K)


SQL_WEIGHTED_SAMPLE = f"""
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           // greatest(n_chars, 1) AS p
  FROM documents)
SELECT doc_id, n_chars, p FROM h ORDER BY p, doc_id LIMIT {WSAMPLE_K}
"""


# ---------------------------------------------------------------------------
# grouped MODE (most frequent value)
# ---------------------------------------------------------------------------


def q_lang_mode(sf_dir: str):
    """Most frequent n_chars per language (ties -> smallest value) —
    the MODE aggregate.  Distributed shape: (lang, n_chars) count
    groupby (value-domain-bounded) -> per-lang vectorized argmax."""
    import ray.data as rd
    from ray.data.aggregate import Count

    def argmax(group: pa.Table) -> pa.Table:
        v = group.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        c = group.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.lexsort((v, -c))[0]
        return pa.table(
            {
                "lang": group.column("lang").slice(0, 1),
                "mode_n_chars": pa.array([int(v[i])], type=pa.int64()),
                "mode_count": pa.array([int(c[i])], type=pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="cnt"))
        .groupby("lang")
        .map_groups(argmax, batch_format="pyarrow")
    )


SQL_LANG_MODE = """
WITH c AS (
  SELECT lang, n_chars, COUNT(*) AS cnt FROM documents GROUP BY lang, n_chars)
SELECT lang, n_chars AS mode_n_chars, cnt AS mode_count FROM c
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, n_chars ASC) = 1
"""


# ---------------------------------------------------------------------------
# fixed-width value histogram (OLAP binning report)
# ---------------------------------------------------------------------------

HIST_WIDTH = 25  # cents-bucket width over integerized value


def q_value_histogram(sf_dir: str):
    """Equi-width histogram of integerized value per event type —
    buckets are floor(cents / W), exact ints both engines (negative
    values floor toward -inf in numpy; DuckDB reproduces with an
    explicit floor-division form).  One partial-agg scan."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bucket = cents // HIST_WIDTH  # floor division (negatives toward -inf)
        types, tinv = np.unique(et, return_inverse=True)
        comp = tinv.astype(np.int64) * np.int64(1 << 32) + (bucket + (1 << 30))
        uc, n = np.unique(comp, return_counts=True)
        t_idx = (uc >> np.int64(32)).astype(np.int64)
        b_val = (uc & np.int64((1 << 32) - 1)) - (1 << 30)
        return pa.table(
            {
                "event_type": pa.array(types[t_idx].tolist(), type=pa.string()),
                "bucket": pa.array(b_val, type=pa.int64()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum(on="n", alias_name="n"))
    )


SQL_VALUE_HISTOGRAM = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS cents FROM events),
b AS (
  SELECT event_type,
         CAST(floor(CAST(cents AS DOUBLE) / {HIST_WIDTH}) AS BIGINT) AS bucket
  FROM v)
SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# grid densification (zero-filled reporting matrix)
# ---------------------------------------------------------------------------


def q_daily_dense(sf_dir: str):
    """Zero-filled (day x event_type) count matrix — the reporting
    densification op: missing combinations appear with n = 0.  The
    distributed part is the count groupby; the dense fill happens on
    the REPORT-sized result (|days| x |types| rows by definition), so
    the driver never touches event rows."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(day.astype(str), "|"), et.astype(str))
        keys, n = np.unique(key, return_counts=True)
        parts = [k.split("|") for k in keys.tolist()]
        return pa.table(
            {
                "day": pa.array([p[0] for p in parts], type=pa.string()),
                "event_type": pa.array([p[1] for p in parts], type=pa.string()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()  # report-sized: |days| x |types| upper bound
    )
    days = sorted({r["day"] for r in counts})
    types = sorted({r["event_type"] for r in counts})
    have = {(r["day"], r["event_type"]): int(r["n"]) for r in counts}
    out_day, out_type, out_n = [], [], []
    for d in days:
        for t in types:
            out_day.append(d)
            out_type.append(t)
            out_n.append(have.get((d, t), 0))
    return pa.table(
        {
            "day": pa.array(out_day, type=pa.string()),
            "event_type": pa.array(out_type, type=pa.string()),
            "n": pa.array(out_n, type=pa.int64()),
        }
    )


SQL_DAILY_DENSE = """
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
d AS (SELECT DISTINCT day FROM c),
t AS (SELECT DISTINCT event_type FROM c)
SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
FROM d CROSS JOIN t
LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
"""


# ---------------------------------------------------------------------------
# grouped MAD (median absolute deviation — robust statistics)
# ---------------------------------------------------------------------------
#
# MAD = median(|x - median(x)|) per group, over integerized cents.
# Two passes of the VALUE-DOMAIN-BOUNDED exact-median plan (the
# quality_filter pattern): a (group, cents) count groupby + driver rank
# walk gives each group's median; a second count groupby over the
# derived |cents - med| deviations gives the MAD.  Both exchanges are
# bounded by #groups x #distinct values, never by row count.  (The
# general-domain float path is grouped_quantile's 16-bit histogram
# refinement; this is the integer-metric fast path.)


def _rank_walk(rows, key_col: str, val_col: str, cnt_col: str, q: float = 0.5) -> dict:
    """Discrete quantile per key from (key, value, count) rows — the
    quantile_disc ceil(q*n)-1 rule (== (n-1)//2 at q=0.5)."""
    import math

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[key_col], []).append((r[val_col], r[cnt_col]))
    out: dict = {}
    for k, vs in by_key.items():
        vs.sort()
        total = sum(c for _, c in vs)
        target = max(math.ceil(q * total) - 1, 0)
        cum = 0
        for v, c in vs:
            cum += c
            if cum > target:
                out[k] = v
                break
    return out


def q_grouped_mad(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/events.parquet"

    def cents_counts(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        ok = np.isfinite(val)
        et, val = et[ok], val[ok]
        c = np.floor(val * 100.0).astype(np.int64)
        types, tinv = np.unique(et, return_inverse=True)
        comp = tinv.astype(np.int64) * np.int64(1 << 40) + (c + (1 << 38))
        uc, n = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[(uc >> np.int64(40))].tolist(), type=pa.string()),
                "cents": pa.array((uc & np.int64((1 << 40) - 1)) - (1 << 38), type=pa.int64()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(path, columns=["event_type", "value"])
        .map_batches(cents_counts, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()  # #groups x #distinct cents — domain-bounded
    )
    med = _rank_walk(counts, "event_type", "cents", "n")
    med_ref = ray.put(med)

    def dev_counts(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        t = cents_counts(batch)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        meds = np.array([m[v] for v in et], dtype=np.int64)
        dev = np.abs(c - meds)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "dev": pa.array(dev, type=pa.int64()),
                "n": t.column("n"),
            }
        )

    dev_rows = (
        rd.read_parquet(path, columns=["event_type", "value"])
        .map_batches(dev_counts, batch_format="pyarrow")
        .groupby(["event_type", "dev"])
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    mad = _rank_walk(dev_rows, "event_type", "dev", "n")
    keys = sorted(med)
    return pa.table(
        {
            "event_type": pa.array(keys, type=pa.string()),
            "med_cents": pa.array([med[k] for k in keys], type=pa.int64()),
            "mad_cents": pa.array([mad[k] for k in keys], type=pa.int64()),
        }
    )


SQL_GROUPED_MAD = """
WITH v AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
m AS (SELECT event_type, quantile_disc(c, 0.5) AS med_cents FROM v GROUP BY 1),
d AS (
  SELECT v.event_type, abs(v.c - m.med_cents) AS dev
  FROM v JOIN m USING (event_type))
SELECT m.event_type, m.med_cents,
       quantile_disc(d.dev, 0.5) AS mad_cents
FROM d JOIN m USING (event_type)
GROUP BY m.event_type, m.med_cents
"""


# ---------------------------------------------------------------------------
# word co-occurrence (market-basket / association analysis)
# ---------------------------------------------------------------------------

COOC_K = 25


def _cooc_pair_partials(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    words = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    wa = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    offs = wa.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    enc = wa.values.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    n_docs = len(offs) - 1
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    # per-doc distinct (doc, code) pairs
    dk = np.unique(doc_idx * np.int64(1 << 32) + codes)
    d = (dk >> np.int64(32)).astype(np.int64)
    c = (dk & np.int64((1 << 32) - 1)).astype(np.int64)
    # upper-triangle pair explode per doc (codes sorted within doc by
    # construction of np.unique on the composite key)
    starts = np.searchsorted(d, np.arange(n_docs, dtype=np.int64))
    ends = np.searchsorted(d, np.arange(1, n_docs + 1, dtype=np.int64))
    sizes = ends - starts
    n_pairs = sizes * (sizes - 1) // 2
    total = int(n_pairs.sum())
    if total == 0:
        return pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    # build (i, j) index pairs for all docs at once
    doc_of_pair = np.repeat(np.arange(n_docs, dtype=np.int64), n_pairs)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_pairs)[:-1])), n_pairs
    )
    sz = sizes[doc_of_pair]
    # map linear within-index -> (i, j) of the upper triangle:
    # i = row such that cum pairs before row i <= within; vectorized
    # via the quadratic-formula inverse of t(i) = i*sz - i(i+1)/2
    i = np.floor(
        (2 * sz - 1 - np.sqrt((2 * sz - 1) ** 2 - 8 * within.astype(np.float64))) / 2
    ).astype(np.int64)
    before = i * sz - i * (i + 1) // 2
    # float guard: fix any off-by-one from the sqrt
    over = before > within
    i[over] -= 1
    before = i * sz - i * (i + 1) // 2
    under = (within - before) >= (sz - 1 - i)
    i[under] += 1
    before = i * sz - i * (i + 1) // 2
    j = i + 1 + (within - before)
    base = starts[doc_of_pair]
    a = c[base + i]
    b = c[base + j]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    pk, n = np.unique(lo * np.int64(1 << 32) + hi, return_counts=True)
    # canonicalize by STRING order (the SQL's a.w < b.w), not code
    # order — dictionary codes are batch-local and not lexicographic
    s1 = vocab[(pk >> np.int64(32))]
    s2 = vocab[(pk & np.int64((1 << 32) - 1))]
    swap = s1 > s2
    w1 = np.where(swap, s2, s1)
    w2 = np.where(swap, s1, s2)
    return pa.table(
        {
            "w1": pa.array(w1.tolist(), type=pa.string()),
            "w2": pa.array(w2.tolist(), type=pa.string()),
            "n": pa.array(n.astype(np.int64), type=pa.int64()),
        }
    )


def q_word_cooc(sf_dir: str):
    """Top word pairs by document co-occurrence — the market-basket
    shape.  Per batch: one dictionary-encode, per-doc DISTINCT word
    codes, vectorized upper-triangle pair explode, partial pair counts;
    the shuffle carries (w1, w2, n) rows bounded by vocabulary^2 (a
    corpus property, not row count); final global top-k by
    (count desc, pair asc).  Per-doc pair mass is O(distinct words per
    doc squared) — the inherent cost of exact co-occurrence; the scale
    lever is a vocabulary or per-doc-distinct cap."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(_cooc_pair_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum(on="n", alias_name="n"))
        .sort(["n", "w1", "w2"], descending=[True, False, False])
        .limit(COOC_K)
    )


SQL_WORD_COOC = f"""
WITH w AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n
FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY a.w, b.w
ORDER BY n DESC, w1, w2
LIMIT {COOC_K}
"""


# ---------------------------------------------------------------------------
# winsorized mean (robust location estimate)
# ---------------------------------------------------------------------------

WINSOR_LO = 0.1
WINSOR_HI = 0.9


def q_winsorized_mean(sf_dir: str):
    """Per-group winsorized sums: values clamped to the group's
    [p10, p90] discrete quantiles, then EXACT int64 sums — the
    robust-mean companion to grouped_mad, same value-domain-bounded
    two-phase plan (count groupby + rank walks -> broadcast clamps ->
    streaming clamp + partial sums).  The mean itself is sum/n, one
    float division away; the gate compares the exact integers."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/events.parquet"

    def cents_counts(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        ok = np.isfinite(val)
        et, val = et[ok], val[ok]
        c = np.floor(val * 100.0).astype(np.int64)
        types, tinv = np.unique(et, return_inverse=True)
        comp = tinv.astype(np.int64) * np.int64(1 << 40) + (c + (1 << 38))
        uc, n = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[(uc >> np.int64(40))].tolist(), type=pa.string()),
                "cents": pa.array((uc & np.int64((1 << 40) - 1)) - (1 << 38), type=pa.int64()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(path, columns=["event_type", "value"])
        .map_batches(cents_counts, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()  # domain-bounded
    )
    lo = _rank_walk(counts, "event_type", "cents", "n", q=WINSOR_LO)
    hi = _rank_walk(counts, "event_type", "cents", "n", q=WINSOR_HI)
    clamp_ref = ray.put((lo, hi))

    def clamped_partials(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(clamp_ref)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        ok = np.isfinite(val)
        et, val = et[ok], val[ok]
        c = np.floor(val * 100.0).astype(np.int64)
        lo_a = np.array([lo[v] for v in et], dtype=np.int64)
        hi_a = np.array([hi[v] for v in et], dtype=np.int64)
        w = np.minimum(np.maximum(c, lo_a), hi_a)
        types, inv = np.unique(et, return_inverse=True)
        acc = np.zeros(len(types), dtype=np.int64)
        np.add.at(acc, inv, w)
        n = np.bincount(inv, minlength=len(types)).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(types.tolist(), type=pa.string()),
                "n": pa.array(n, type=pa.int64()),
                "sum_wins_cents": pa.array(acc, type=pa.int64()),
            }
        )

    return (
        rd.read_parquet(path, columns=["event_type", "value"])
        .map_batches(clamped_partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum(on="n", alias_name="n"), Sum(on="sum_wins_cents", alias_name="sum_wins_cents"))
    )


SQL_WINSORIZED_MEAN = f"""
WITH v AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
q AS (
  SELECT event_type,
         quantile_disc(c, {WINSOR_LO}) AS lo,
         quantile_disc(c, {WINSOR_HI}) AS hi
  FROM v GROUP BY event_type)
SELECT v.event_type, COUNT(*) AS n,
       CAST(SUM(LEAST(GREATEST(v.c, q.lo), q.hi)) AS BIGINT) AS sum_wins_cents
FROM v JOIN q USING (event_type)
GROUP BY v.event_type
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (integer-exact scoring)
# ---------------------------------------------------------------------------
#
# Top keyword per document by tf * N // df — an integer-exact TF-IDF
# variant (integer division replaces log(N/df): same ordering intent,
# zero libm, both engines bit-identical).  Distributed shape: the df
# table is vocabulary-bounded (distributed distinct-(doc, term) count ->
# broadcast); the scoring pass is per-document and needs NO shuffle
# because a document never spans rows.


def q_tfidf_top_term(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.ParquetFile(path).metadata.num_rows  # footer metadata only

    df_rows = (
        rd.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(_tfidf_df_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum(on="df", alias_name="df"))
        .take_all()  # vocabulary-bounded
    )
    terms = np.asarray([r["term"] for r in df_rows], dtype=object)
    dfs = np.asarray([r["df"] for r in df_rows], dtype=np.int64)
    order = np.argsort(terms, kind="stable")
    df_ref = ray.put((terms[order], dfs[order], int(n_docs)))

    def top_term(batch: pa.Table) -> pa.Table:
        vterms, vdf, nd = ray.get(df_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text").combine_chunks()), _TERM_RE.pattern
        )
        wa = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = wa.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        enc = wa.values.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        nonempty = vocab != ""
        doc_idx = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs))
        keep = nonempty[codes]
        doc_idx, codes = doc_idx[keep], codes[keep]
        # tf per (doc, code)
        dk, tf = np.unique(doc_idx * np.int64(1 << 32) + codes, return_counts=True)
        d = (dk >> np.int64(32)).astype(np.int64)
        c = (dk & np.int64((1 << 32) - 1)).astype(np.int64)
        code_df = vdf[np.searchsorted(vterms, vocab[c])]
        score = tf.astype(np.int64) * nd // code_df
        # argmax per doc: sort by (doc, -score, term) and take firsts
        term_strs = vocab[c]
        o = np.lexsort((term_strs, -score, d))
        ds_, first = d[o], np.ones(len(o), dtype=bool)
        first[1:] = ds_[1:] != ds_[:-1]
        sel = o[first]
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did[d[sel]], type=pa.int64()),
                "term": pa.array(term_strs[sel].tolist(), type=pa.string()),
                "tf": pa.array(tf[sel].astype(np.int64), type=pa.int64()),
                "score": pa.array(score[sel], type=pa.int64()),
            }
        )

    return rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        top_term, batch_format="pyarrow"
    )


def _tfidf_df_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequency: distinct (doc, term) ->
    per-term counts.  Mergeable by Sum because a document never spans
    batches (one row per doc)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column("text").combine_chunks()), _TERM_RE.pattern
    )
    wa = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = wa.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    enc = wa.values.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs))
    keep = (vocab != "")[codes]
    dk = np.unique(doc_idx[keep] * np.int64(1 << 32) + codes[keep])
    c = (dk & np.int64((1 << 32) - 1)).astype(np.int64)
    uc, n = np.unique(c, return_counts=True)
    return pa.table(
        {
            "term": pa.array(vocab[uc].tolist(), type=pa.string()),
            "df": pa.array(n.astype(np.int64), type=pa.int64()),
        }
    )


SQL_TFIDF_TOP_TERM = """
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents),
t AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
nd AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, term, tf, score FROM (
  SELECT t.doc_id, t.term, t.tf, t.tf * nd.n // df.df AS score,
         row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY t.tf * nd.n // df.df DESC, t.term ASC) AS rn
  FROM t JOIN df USING (term) CROSS JOIN nd)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# k-means clustering (Lloyd's algorithm, exact integer arithmetic)
# ---------------------------------------------------------------------------
#
# The canonical iterative-ML operator over the embedding column:
# KMEANS_ITERS rounds of assign -> update from a deterministic seed
# (the embeddings of vec_id 0..K-1), then a final assignment under the
# converged centroids.  Bit-reproducibility discipline: vectors are
# quantized once to int64 (floor(x * 4096) — float32->float64 cast and
# one multiply, both IEEE-exact), every distance is an exact int64 sum
# of squares, ties break to the lowest cluster id (numpy argmin ==
# ROW_NUMBER ORDER BY d, c), and the centroid update is
# floor(sum / n) where the only float op is one exactly-rounded
# int->double division — identical in numpy and DuckDB.
#
# Distributed shape (the 100-TB story): the model state is K x D int64
# (2 KB) and lives on the driver — that is legitimate driver state,
# not a materialization.  Each iteration is ONE streaming pass:
# map_batches computes per-batch partial sums via np.add.at (K*D rows
# out per batch), a native groupby shrinks them to K*D total rows, and
# only those 256 numbers return to the driver.  The input is re-read
# from parquet each round rather than materialized — at 10^12 rows a
# cached quantized copy would be ~0.5 PB of object store; re-scanning
# column-pruned parquet per iteration is the fixed-memory answer.
# Empty clusters keep their previous centroid on both sides.


KMEANS_K = 4
KMEANS_ITERS = 3
KMEANS_SCALE = 4096


def _emb_qmatrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, int64 quantized matrix) from one Arrow batch."""
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offs)
    dim = int(widths[0]) if len(widths) else 0
    assert (widths == dim).all(), "embedding column must be fixed-width"
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    X = np.floor(flat * float(KMEANS_SCALE)).astype(np.int64).reshape(-1, dim)
    X = X[offs[0] // dim if dim else 0 :][: batch.num_rows]  # honor sliced arrays
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, X


def _kmeans_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 squared distances, (n, K); K passes of a vectorized
    einsum — no (n, K, D) intermediate."""
    out = np.empty((len(X), len(C)), dtype=np.int64)
    for j in range(len(C)):
        d = X - C[j]
        out[:, j] = np.einsum("ij,ij->i", d, d)
    return out


def q_kmeans(sf_dir: str):
    import pyarrow.parquet as pqt
    import ray.data as rd
    from ray.data.aggregate import Sum

    seed = pqt.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", KMEANS_K)],  # row-group-stat pushdown: K rows, not the table
    )
    sids, C = _emb_qmatrix(seed)
    C = C[np.argsort(sids)]
    dim = C.shape[1]

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    for _ in range(KMEANS_ITERS):
        Cit = C  # 2 KB — shipped in the task closure, cheaper than ray.put

        def partials(batch: pa.Table, _C=Cit) -> pa.Table:
            _, X = _emb_qmatrix(batch)
            a = np.argmin(_kmeans_dists(X, _C), axis=1)
            sums = np.zeros((KMEANS_K, X.shape[1]), dtype=np.int64)
            np.add.at(sums, a, X)
            n = np.bincount(a, minlength=KMEANS_K).astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(np.repeat(np.arange(KMEANS_K, dtype=np.int64), X.shape[1])),
                    "dim": pa.array(np.tile(np.arange(X.shape[1], dtype=np.int64), KMEANS_K)),
                    "s": pa.array(sums.ravel(), type=pa.int64()),
                    "n": pa.array(np.repeat(n, X.shape[1]), type=pa.int64()),
                }
            )

        rows = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["c", "dim"])
            .aggregate(Sum(on="s", alias_name="s"), Sum(on="n", alias_name="n"))
            .take_all()  # K*D rows — the model update, not a data materialization
        )
        newC = C.copy()  # empty cluster -> keep previous centroid
        for r in rows:
            if r["n"] > 0:
                newC[r["c"], r["dim"]] = int(np.floor(float(r["s"]) / float(r["n"])))
        C = newC

    Cfin = C

    def assign(batch: pa.Table, _C=Cfin) -> pa.Table:
        ids, X = _emb_qmatrix(batch)
        d = _kmeans_dists(X, _C)
        a = np.argmin(d, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
                "dist": pa.array(d[np.arange(len(a)), a], type=pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def _sql_kmeans() -> str:
    """ITERS unrolled Lloyd rounds as chained CTEs (assign_i under
    c_{i-1}, update to c_i), final assignment under c_ITERS."""
    parts = [
        f"""WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS qv
  FROM embeddings),
c0 AS (SELECT vec_id AS c, dim, qv AS cv FROM q WHERE vec_id < {KMEANS_K})"""
    ]
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(f"""d{i} AS (
  SELECT q.vec_id, c.c, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
  FROM q JOIN c{i - 1} c USING (dim) GROUP BY q.vec_id, c.c),
a{i} AS (
  SELECT vec_id, c AS cluster FROM (
    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d{i})
  WHERE rn = 1),
s{i} AS (
  SELECT a.cluster AS c, q.dim,
         CAST(floor(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM q JOIN a{i} a USING (vec_id) GROUP BY a.cluster, q.dim),
c{i} AS (
  SELECT p.c, p.dim, COALESCE(s{i}.cv, p.cv) AS cv
  FROM c{i - 1} p LEFT JOIN s{i} USING (c, dim))""")
    n = KMEANS_ITERS
    parts.append(f"""df AS (
  SELECT q.vec_id, c.c, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
  FROM q JOIN c{n} c USING (dim) GROUP BY q.vec_id, c.c)
SELECT vec_id, c AS cluster, CAST(d AS BIGINT) AS dist FROM (
  SELECT vec_id, c, d, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
WHERE rn = 1""")
    return ",\n".join(parts)


SQL_KMEANS = _sql_kmeans()


# ---------------------------------------------------------------------------
# exact Gram matrix + top principal component (distributed linear algebra)
# ---------------------------------------------------------------------------
#
# The scalable-PCA shape: the data-sized pass reduces the embedding
# stream to a CONSTANT d x d Gram aggregate (per-batch int64 matmul
# over exactly-integerized components, native Sum merge — order-free
# and bit-reproducible); the eigen step then runs on that d x d result,
# which is the legitimate "aggregate reaches the driver" boundary (d=64
# here; d^2 rows regardless of N).  Components are integerized in
# float64 (floor(x * 1e6)) exactly like label_centroids, so the SQL
# oracle reproduces the Gram matrix bit-for-bit via a vec_id self-join
# over unnested components.
#
# int64 headroom: |q| <= ~4e6 per component, so a q_i*q_j product is
# <= ~1.6e13 and N rows sum to N * 1.6e13 — a preflight guard raises
# before silent wraparound (the twap discipline); at 10^12-row scale
# the partial would carry hi/lo split or float128 lanes instead.

GRAM_SCALE = 1_000_000


def _gram_partials(batch: pa.Table) -> pa.Table:
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offs)
    dim = int(widths[0]) if len(widths) else 0
    assert (widths == dim).all(), "embedding column must be fixed-width"
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    q = np.floor(flat * float(GRAM_SCALE)).astype(np.int64).reshape(-1, dim)
    if float(np.max(np.abs(q), initial=0.0)) ** 2 * len(q) > 2.0**62:
        raise ValueError("gram int64 partial overflow: rescale components")
    g = q.T @ q  # exact int64 matmul
    iu, ju = np.triu_indices(dim)
    # sentinel row (-1, -1): this batch's worst-case |cell| contribution
    # shifted down 16 bits.  The merged sentinel bounds the CROSS-BATCH
    # sum (sum of per-batch maxima >= any cell's |sum|), so the final
    # stage can refuse before int64 wraparound instead of diverging
    # silently from the oracle's HUGEINT.
    cap = (int(np.max(np.abs(g), initial=0)) >> 16) + 1
    return pa.table(
        {
            "i": pa.array(np.concatenate([iu.astype(np.int64), [-1]]), type=pa.int64()),
            "j": pa.array(np.concatenate([ju.astype(np.int64), [-1]]), type=pa.int64()),
            "s": pa.array(np.concatenate([g[iu, ju], [cap]]), type=pa.int64()),
        }
    )


def q_embed_gram(sf_dir: str):
    """Exact upper-triangle Gram matrix of the integerized embedding
    column: one streaming pass, d(d+1)/2-row output independent of N."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def check_and_strip(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sent = pc.equal(batch.column("i"), -1)
        if pc.any(sent).as_py():
            cap = batch.filter(sent).column("s")[0].as_py()
            if cap >= 1 << 46:  # sum of per-batch maxima would pass 2^62
                raise ValueError("gram int64 merge overflow: rescale components")
        return batch.filter(pc.invert(sent))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return (
        ds.map_batches(_gram_partials, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum(on="s", alias_name="s"))
        .map_batches(check_and_strip, batch_format="pyarrow")
    )


SQL_EMBED_GRAM = f"""
WITH m AS (
  SELECT vec_id,
         unnest(embedding) AS val,
         unnest(generate_series(0, len(embedding) - 1)) AS i
  FROM embeddings),
q AS (
  SELECT vec_id, i,
         CAST(floor(CAST(val AS DOUBLE) * {GRAM_SCALE}.0) AS BIGINT) AS qv
  FROM m)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS s
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""


def q_embed_pca(sf_dir: str):
    """Top principal direction of the (uncentered) integerized
    embedding Gram matrix by power iteration to fixpoint on the d x d
    aggregate.  The data-sized work is q_embed_gram's streaming pass;
    the driver touches only the constant d x d matrix.  Rows-only (an
    eigen solve isn't SQL-expressible); numpy-eigh parity is tested in
    tests/test_stats_queries.py.  Sign fixed by making the
    largest-|loading| component positive (ties -> lowest index)."""
    import pandas as pd

    rows = q_embed_gram(sf_dir).to_pandas()
    dim = int(rows["i"].max()) + 1 if len(rows) else 0
    g = np.zeros((dim, dim), dtype=np.float64)
    g[rows["i"], rows["j"]] = rows["s"].to_numpy().astype(np.float64)
    # mirror the strict upper triangle (entries may be negative, so a
    # max against the zero-filled transpose would corrupt them)
    g = g + g.T - np.diag(np.diag(g))
    v = np.zeros(dim)
    if dim:
        # all-ones seed: an axis seed (e.g. e0) sits exactly in the null
        # space when that component is identically zero, and the nrm==0
        # break would then return the seed as a silently wrong answer
        v[:] = 1.0 / np.sqrt(dim)
        for _ in range(20000):  # d x d matvecs; converges in O(log eps / log gap)
            w = g @ v
            nrm = float(np.linalg.norm(w))
            if nrm == 0.0:
                break
            w /= nrm
            done = min(float(np.abs(w - v).max()), float(np.abs(w + v).max())) < 1e-15
            v = w
            if done:
                break
        a = int(np.argmax(np.abs(v)))
        if v[a] < 0:
            v = -v
    return pd.DataFrame(
        {"dim": np.arange(dim, dtype=np.int64), "loading": v}
    )


# ---------------------------------------------------------------------------
# term frequency-of-frequencies (Good-Turing count table)
# ---------------------------------------------------------------------------
#
# The ITERATED aggregation shape: corpus -> per-term total frequency
# (vocabulary-bounded exchange) -> histogram of those frequencies
# (frequency-bounded exchange, the Zipf-tail table Good-Turing
# smoothing needs).  Both passes pre-aggregate inside map_batches so
# each shuffle moves partials, never token streams; the same [^a-z]+
# tokenizer rule as term_df keeps the two oracles consistent.


def _tf_partials(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
        }
    )
    text = batch.column("text").combine_chunks()
    valid = pc.is_valid(text)
    if not pc.all(valid).as_py():
        text = text.filter(valid)
    if len(text) == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(text), _TERM_RE.pattern)
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = flat.value_counts()
    return pa.table(
        {
            "term": vc.field("values"),
            "tf": vc.field("counts").cast(pa.int64()),
        }
    )


def _hist_partials(batch: pa.Table) -> pa.Table:
    tf = batch.column("tf").to_numpy(zero_copy_only=False)
    val, cnt = np.unique(tf, return_counts=True)
    return pa.table(
        {
            "tf": pa.array(val, type=pa.int64()),
            "n_terms": pa.array(cnt.astype(np.int64), type=pa.int64()),
        }
    )


def q_term_freq_hist(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return (
        ds.map_batches(_tf_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum(on="tf", alias_name="tf"))
        .map_batches(_hist_partials, batch_format="pyarrow")
        .groupby("tf")
        .aggregate(Sum(on="n_terms", alias_name="n_terms"))
    )


SQL_TERM_FREQ_HIST = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents),
tf AS (
  SELECT term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY term)
SELECT tf, COUNT(*) AS n_terms FROM tf GROUP BY tf
"""


# ---------------------------------------------------------------------------
# Gini coefficient per group (value-domain-bounded exact rank sums)
# ---------------------------------------------------------------------------
#
# Inequality measure over l_quantity per return flag.  The classic
# formula needs a global within-group sort (rank i of every row), but
# the quantity DOMAIN is bounded (integers 1..50) while the table is
# not — so the distributed plan is one (group, value) count aggregate
# (the global_rank pattern, olap_queries.py:178), and the driver folds
# the tiny #groups x #values count table into the exact integer rank
# sum: a run of c equal values v starting after rank r contributes
# v * (2*c*r + c*(c+1) - (n+1)*c) to G = SUM_i (2i - n - 1) * x_(i).
# Ties are safe: equal values make the contribution independent of
# their relative order.  All arithmetic stays int64 (G <= n^2 * 50,
# within 2^63 up to ~10^8 rows per group; the HUGEINT oracle would
# diverge past that, so the fold asserts); ONE float division at the
# end matches the oracle's CAST-then-divide bit-for-bit.

GINI_MAX_N = 100_000_000  # per-group row bound keeping G inside int64


def q_gini(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    import pyarrow.compute as pc

    counts = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
        .map_batches(
            lambda b: pa.table(
                {
                    "g": b.column("l_returnflag"),
                    "x": pc.cast(b.column("l_quantity"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["g", "x"])
        .aggregate(Count(alias_name="c"))
        .take_all()  # #groups x #distinct-values — domain-bounded, driver-small
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in counts:
        groups.setdefault(r["g"], []).append((int(r["x"]), int(r["c"])))
    gs, ginis = [], []
    for g in sorted(groups):
        runs = sorted(groups[g])
        n = sum(c for _, c in runs)
        if n > GINI_MAX_N:
            raise ValueError("gini int64 rank-sum overflow: switch G to object ints")
        s = sum(v * c for v, c in runs)
        big_g, r = 0, 0
        for v, c in runs:
            big_g += v * (2 * c * r + c * (c + 1) - (n + 1) * c)
            r += c
        gs.append(g)
        ginis.append(float(big_g) / (float(n) * float(s)))
    return pa.table(
        {"l_returnflag": pa.array(gs, type=pa.string()), "gini": pa.array(ginis, type=pa.float64())}
    )


SQL_GINI = """
WITH r AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS i,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT l_returnflag,
       CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
         / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS gini
FROM r GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# weighted median (value-domain-bounded, fully exact — no division)
# ---------------------------------------------------------------------------
#
# The sampling-weight variant of the grouped median: the smallest
# quantity x whose cumulative extended-price weight reaches half the
# group total (lower weighted median, 2*cum >= total in exact integer
# cents — ties and float-sum order can never flip the pick).  Same
# value-domain-bounded physics as gini: one (group, value) Sum
# aggregate shuffles #groups x #values slim rows, and the fold over
# that tiny table is driver-side by design (domain-bounded, not
# data-bounded).

def q_weighted_median(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor(pc.multiply(batch.column("l_extendedprice"), 100.0)), pa.int64())
        return pa.table(
            {
                "g": batch.column("l_returnflag"),
                "x": pc.cast(batch.column("l_quantity"), pa.int64()),
                "wt": w,
            }
        )

    counts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        .map_batches(cents, batch_format="pyarrow")
        .groupby(["g", "x"])
        .aggregate(Sum(on="wt", alias_name="w"))
        .take_all()  # #groups x #distinct-values — domain-bounded, driver-small
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in counts:
        groups.setdefault(r["g"], []).append((int(r["x"]), int(r["w"])))
    gs, meds, tots = [], [], []
    for g in sorted(groups):
        runs = sorted(groups[g])
        tot = sum(w for _, w in runs)
        cum = 0
        for v, w in runs:
            cum += w
            if 2 * cum >= tot:
                med = v
                break
        gs.append(g)
        meds.append(med)
        tots.append(tot)
    return pa.table(
        {
            "l_returnflag": pa.array(gs, type=pa.string()),
            "wmedian": pa.array(meds, type=pa.int64()),
            "total_w": pa.array(tots, type=pa.int64()),
        }
    )


SQL_WEIGHTED_MEDIAN = """
WITH w AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS wt
  FROM lineitem),
cum AS (SELECT g, x, SUM(wt) AS cw FROM w GROUP BY g, x),
o AS (
  SELECT g, x,
         SUM(cw) OVER (PARTITION BY g ORDER BY x) AS run,
         SUM(cw) OVER (PARTITION BY g) AS tot
  FROM cum)
SELECT g AS l_returnflag,
       CAST(MIN(x) AS BIGINT) AS wmedian,
       CAST(MAX(tot) AS BIGINT) AS total_w
FROM o WHERE 2 * run >= tot GROUP BY g
"""


# ---------------------------------------------------------------------------
# vector introspection: top-|component| ranking over the list column
# ---------------------------------------------------------------------------
#
# The embedding-debugging shape (which dimensions dominate a vector —
# saliency / feature-attribution reports): per vec_id, the 3 components
# with the largest |value|, rank-ordered with a deterministic
# ascending-index tie-break.  The Ray side is one zero-copy matrix
# reshape + a stable argsort per batch (no explode — the d-wide row
# never becomes d rows); the oracle pays the full UNNEST + window
# enumeration.  float32 values compare identically in numpy and DuckDB
# (both IEEE; the output casts to float64 losslessly).

VEC_TOPC_K = 3


def q_vec_top_components(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def topc(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch.column("embedding")
        flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        n = len(vid)
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "rk": pa.array([], type=pa.int64()),
                    "comp_idx": pa.array([], type=pa.int64()),
                    "comp_val": pa.array([], type=pa.float64()),
                }
            )
        mat = flat.reshape(n, -1)
        # stable argsort on -|v|: descending magnitude, ascending index ties
        order = np.argsort(-np.abs(mat), axis=1, kind="stable")[:, :VEC_TOPC_K]
        k = order.shape[1]
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, k), type=pa.int64()),
                "rk": pa.array(np.tile(np.arange(1, k + 1), n), type=pa.int64()),
                "comp_idx": pa.array(order.ravel(), type=pa.int64()),
                "comp_val": pa.array(
                    np.take_along_axis(mat, order, axis=1).ravel().astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )

    return ds.map_batches(topc, batch_format="pyarrow")


SQL_VEC_TOP_COMPONENTS = f"""
WITH u AS (
  SELECT vec_id, g.range AS comp_idx,
         list_extract(embedding, CAST(g.range AS INTEGER) + 1) AS v
  FROM embeddings, range(0, 64) g),
r AS (
  SELECT vec_id, comp_idx, CAST(v AS DOUBLE) AS comp_val,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY abs(v) DESC, comp_idx) AS rk
  FROM u)
SELECT vec_id, CAST(rk AS BIGINT) AS rk, CAST(comp_idx AS BIGINT) AS comp_idx, comp_val
FROM r WHERE rk <= {VEC_TOPC_K}
"""


# ---------------------------------------------------------------------------
# quantile discretization (equal-frequency binning, tie-deterministic)
# ---------------------------------------------------------------------------
#
# The feature-engineering binner: every lineitem row labeled with its
# global quantity quartile.  NTILE would split ties by arbitrary row
# order; instead bucket = 1 + (4 * (RANK - 1)) // n with RANK = "ties
# share the rank of their first row" — fully deterministic, exact
# integer arithmetic.  Distributed shape: one (value -> count)
# aggregate over the bounded domain, a driver-side fold of the tiny
# count table into a value -> bucket map (domain-bounded, like gini),
# and a broadcast searchsorted assign pass — the row stream itself is
# never sorted or ranked.

QBINS_K = 4


def q_quantile_bins(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
        .map_batches(
            lambda b: pa.table({"x": pc.cast(b.column("l_quantity"), pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("x")
        .aggregate(Count(alias_name="c"))
        .take_all()  # #distinct-values — domain-bounded, driver-small
    )
    runs = sorted((int(r["x"]), int(r["c"])) for r in counts)
    n = sum(c for _, c in runs)
    vals = np.array([v for v, _ in runs], dtype=np.int64)
    buckets, rank = [], 1
    for _, c in runs:
        buckets.append(1 + (QBINS_K * (rank - 1)) // n)
        rank += c
    bmap_ref = ray.put((vals, np.array(buckets, dtype=np.int64)))

    def assign(batch: pa.Table) -> pa.Table:
        vals_b, buck_b = ray.get(bmap_ref)
        q = pc.cast(batch.column("l_quantity"), pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vals_b, q)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_linenumber": batch.column("l_linenumber"),
                "qty": pa.array(q, type=pa.int64()),
                "bucket": pa.array(buck_b[pos], type=pa.int64()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    ).map_batches(assign, batch_format="pyarrow")


SQL_QUANTILE_BINS = f"""
WITH r AS (
  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
         RANK() OVER (ORDER BY l_quantity) AS rk,
         COUNT(*) OVER () AS n
  FROM lineitem)
SELECT l_orderkey, l_linenumber, qty,
       CAST(1 + ({QBINS_K} * (rk - 1)) // n AS BIGINT) AS bucket
FROM r
"""


# ---------------------------------------------------------------------------
# AUC (ROC area) via the Mann-Whitney rank-sum — exact rational form
# ---------------------------------------------------------------------------
#
# The model-eval shape: treating event_type='purchase' as the positive
# label and cents(value) as the score, AUC equals U / (n1*n0) with the
# tie-corrected U = R1 - n1(n1+1)/2 over AVERAGE ranks.  Everything is
# kept in integers by carrying 2x quantities (2*avg_rank = 2*min_rank +
# t - 1 is always integral): the pipeline emits exact (cents ->
# pos/neg count) partials, one slim value-domain-bounded shuffle, and a
# driver fold over #distinct-cents rows (the gini pattern).  The ONLY
# float op is the final single division num/den — IEEE-exactly-rounded,
# so numpy and DuckDB agree bit-for-bit.

def _auc_partials(batch: pa.Table) -> pa.Table:
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    val = batch.column("value").to_numpy(zero_copy_only=False)
    c = np.floor(val * 100.0).astype(np.int64)
    y = (et == "purchase").astype(np.int64)
    keys, inv = np.unique(c, return_inverse=True)
    pos = np.zeros(len(keys), dtype=np.int64)
    tot = np.bincount(inv, minlength=len(keys)).astype(np.int64)
    np.add.at(pos, inv, y)
    return pa.table(
        {
            "c": pa.array(keys, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
            "tot": pa.array(tot, type=pa.int64()),
        }
    )


def q_auc(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(_auc_partials, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum(on="pos", alias_name="p"), Sum(on="tot", alias_name="t"))
        .take_all()  # #distinct cents — value-domain-bounded, driver-small
    )
    runs = sorted((int(r["c"]), int(r["p"]), int(r["t"])) for r in counts)
    r = 0
    two_r1 = 0  # 2 * rank-sum of positives, average ranks
    n1 = 0
    n = 0
    for _, p, t in runs:
        two_r1 += p * (2 * r + t + 1)
        r += t
        n1 += p
        n += t
    n0 = n - n1
    num = two_r1 - n1 * (n1 + 1)  # = 2*U
    den = 2 * n1 * n0
    return pa.table(
        {
            "n_pos": pa.array([n1], type=pa.int64()),
            "n_neg": pa.array([n0], type=pa.int64()),
            "auc_num": pa.array([num], type=pa.int64()),
            "auc_den": pa.array([den], type=pa.int64()),
            "auc": pa.array([float(num) / float(den)], type=pa.float64()),
        }
    )


SQL_AUC = """
WITH s AS (
  SELECT CAST(floor(value * 100.0) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
r AS (
  SELECT y, 2 * RANK() OVER (ORDER BY c) + COUNT(*) OVER (PARTITION BY c) - 1 AS two_rk
  FROM s),
agg AS (
  SELECT SUM(CASE WHEN y = 1 THEN two_rk ELSE 0 END) AS two_r1,
         SUM(y) AS n1, SUM(1 - y) AS n0
  FROM r)
SELECT CAST(n1 AS BIGINT) AS n_pos,
       CAST(n0 AS BIGINT) AS n_neg,
       CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS auc_num,
       CAST(2 * n1 * n0 AS BIGINT) AS auc_den,
       CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / CAST(2 * n1 * n0 AS DOUBLE) AS auc
FROM agg
"""


# ---------------------------------------------------------------------------
# Simpson diversity index per user — entropy-family, fully rational
# ---------------------------------------------------------------------------
#
# Behavioral-diversity signal: per user, the probability two events
# drawn without replacement share an event_type,
#     lambda = sum_i c_i (c_i - 1) / (n (n - 1)),   diversity = 1 - lambda.
# Unlike Shannon entropy (whose log has no exactly-rounded guarantee
# across libms) this is a RATIONAL statistic: exact int64 count
# aggregation end to end, then one division and one subtraction — both
# IEEE-exactly-rounded, so the DuckDB oracle matches bit-for-bit.
# Physically: one native (user, type) Count shuffle (pre-combined per
# block by Ray's hash aggregate), then a per-user fold over
# vocabulary-cardinality rows.

def q_simpson_diversity(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="c"))
    )

    def fold(g: pa.Table) -> pa.Table:
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(c.sum())
        s = int((c * (c - 1)).sum())
        div = 1.0 - float(s) / float(n * (n - 1)) if n >= 2 else None
        return pa.table(
            {
                "user_id": g.column("user_id").slice(0, 1).cast(pa.int64()),
                "n_events": pa.array([n], type=pa.int64()),
                "simpson": pa.array([div], type=pa.float64()),
            }
        )

    return counts.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_SIMPSON_DIVERSITY = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type),
a AS (
  SELECT user_id, SUM(c) AS n, SUM(c * (c - 1)) AS s
  FROM c GROUP BY user_id)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CASE WHEN n >= 2
            THEN 1.0 - CAST(s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
       END AS simpson
FROM a
"""


# ---------------------------------------------------------------------------
# value vs user median: grouped-statistic join-back normalization
# ---------------------------------------------------------------------------
#
# The enrich-the-stream-with-its-own-group-statistic shape (robust
# sibling of group_zscore's mean/stddev): each event carries its
# deviation from ITS USER's discrete median (quantile_disc rule,
# sorted index ceil(0.5*n)-1, exact cents).  Plan: one (user, cents)
# Count shuffle (value-domain-bounded per user), a vectorized per-user
# cumsum fold to the median, and one distributed join of the slim
# user-median table back onto the event stream — the stream itself is
# never sorted and crosses the wire once.

def q_value_vs_median(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    def cents_rows(batch: pa.Table) -> pa.Table:
        c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "c": pa.array(c, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(cents_rows, batch_format="pyarrow")

    counts = ds.groupby(["user_id", "c"]).aggregate(Count(alias_name="n"))

    def median_fold(g: pa.Table) -> pa.Table:
        c = g.column("c").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c, n = c[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        idx = max(0, int(np.ceil(0.5 * total)) - 1)
        med = int(c[np.searchsorted(cum, idx + 1)])
        return pa.table(
            {
                "m_uid": g.column("user_id").slice(0, 1).cast(pa.int64()),
                "median_cents": pa.array([med], type=pa.int64()),
            }
        )

    from .olap_queries import _scrub_empties

    medians = _scrub_empties(
        counts.groupby("user_id").map_groups(median_fold, batch_format="pyarrow")
    )
    joined = ds.join(
        medians, join_type="inner", num_partitions=8, on=("user_id",), right_on=("m_uid",)
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        m = batch.column("median_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "median_cents": batch.column("median_cents"),
                "dev_cents": pa.array(c - m, type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_VALUE_VS_MEDIAN = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(value * 100.0) AS BIGINT) AS c
  FROM events),
m AS (SELECT user_id, quantile_disc(c, 0.5) AS med FROM e GROUP BY user_id)
SELECT e.event_id, e.user_id,
       CAST(m.med AS BIGINT) AS median_cents,
       CAST(e.c - m.med AS BIGINT) AS dev_cents
FROM e JOIN m USING (user_id)
"""


# ---------------------------------------------------------------------------
# chi-squared contingency cells: lang x source independence contributions
# ---------------------------------------------------------------------------
#
# The categorical-independence report (is document language independent
# of its source?): the full dense lang x source grid with each cell's
# observed count and its chi-squared contribution
#     (o - e)^2 / e  with  e = r*c/N,
# carried EXACTLY as the rational ((o*N - r*c)^2, N*r*c) plus one
# final float division per cell.  All three margins come from ONE
# (lang, source) Count shuffle (the margins fold from the cell counts —
# no second scan), and the grid assembly is a vocabulary-bounded driver
# fold (|langs| x |sources| cells), the gini/weighted-median physics.
# DOMAIN BOUND: the int64 rational carry requires (o*N - r*c)^2 < 2^63,
# i.e. |o*N - r*c| < ~3.04e9 — guaranteed for near-independent margins
# at any N (o*N ~ r*c) but violated by strongly dependent margins once
# N reaches ~5e4 (worst case N^4/16).  The fold below checks the fit
# explicitly and raises with the float64-carry remedy rather than
# letting pyarrow fail opaquely; the DuckDB oracle computes the same
# products in HUGEINT and its BIGINT cast enforces the same bound.

def q_chi2_cells(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="o"))
        .take_all()  # |langs| x |sources| — vocabulary-bounded, driver-small
    )
    obs = {(r["lang"], r["source"]): int(r["o"]) for r in counts}
    langs = sorted({k[0] for k in obs})
    sources = sorted({k[1] for k in obs})
    rtot = {lg: sum(obs.get((lg, s), 0) for s in sources) for lg in langs}
    ctot = {s: sum(obs.get((lg, s), 0) for lg in langs) for s in sources}
    n = sum(rtot.values())
    out_l, out_s, out_o, out_num, out_den, out_c = [], [], [], [], [], []
    for lg in langs:
        for s in sources:
            o = obs.get((lg, s), 0)
            num = (o * n - rtot[lg] * ctot[s]) ** 2
            den = n * rtot[lg] * ctot[s]
            if num >= 2**63 or den >= 2**63:
                raise ValueError(
                    "chi2_cells: exact rational outgrew int64 (strongly "
                    "dependent margins at this N); carry chi2_num/chi2_den "
                    "as float64 for this corpus"
                )
            out_l.append(lg)
            out_s.append(s)
            out_o.append(o)
            out_num.append(num)
            out_den.append(den)
            out_c.append(float(num) / float(den))
    return pa.table(
        {
            "lang": pa.array(out_l, type=pa.string()),
            "source": pa.array(out_s, type=pa.string()),
            "o": pa.array(out_o, type=pa.int64()),
            "chi2_num": pa.array(out_num, type=pa.int64()),
            "chi2_den": pa.array(out_den, type=pa.int64()),
            "contrib": pa.array(out_c, type=pa.float64()),
        }
    )


SQL_CHI2_CELLS = """
WITH o AS (SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source),
r AS (SELECT lang, SUM(o) AS r FROM o GROUP BY lang),
c AS (SELECT source, SUM(o) AS c FROM o GROUP BY source),
n AS (SELECT SUM(o) AS n FROM o),
grid AS (
  SELECT r.lang, c.source, COALESCE(o.o, 0) AS o, r.r, c.c, n.n
  FROM r CROSS JOIN c CROSS JOIN n
  LEFT JOIN o ON o.lang = r.lang AND o.source = c.source)
SELECT lang, source, CAST(o AS BIGINT) AS o,
       CAST((o * n - r * c) * (o * n - r * c) AS BIGINT) AS chi2_num,
       CAST(n * r * c AS BIGINT) AS chi2_den,
       CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE)
         / CAST(n * r * c AS DOUBLE) AS contrib
FROM grid
"""


# ---------------------------------------------------------------------------
# sentence statistics: punctuation-delimited segmentation, exact ints
# ---------------------------------------------------------------------------
#
# The readability-signal member of the text-analysis family: per doc,
# non-overlapping sentence-terminator runs ([.!?]+), whitespace-token
# count, and integer-micro words-per-sentence — three vectorized RE2
# kernels per batch (pyarrow count_substring_regex), zero per-row
# Python, and a pure map (no shuffle at all).

def q_sentence_stats(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_sent = pc.cast(pc.count_substring_regex(text, r"[.!?]+"), pa.int64())
        n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        ns = n_sent.to_numpy(zero_copy_only=False)
        nw = n_words.to_numpy(zero_copy_only=False)
        wps = (nw * 1_000_000) // np.maximum(ns, 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_sentences": n_sent,
                "n_words": n_words,
                "wps_micro": pa.array(wps, type=pa.int64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


SQL_SENTENCE_STATS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
       CAST((len(regexp_extract_all(text, '\S+')) * 1000000)
              // greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS wps_micro
FROM documents
"""


# ---------------------------------------------------------------------------
# vector-to-centroid distance: aggregate -> join-back over the vector column
# ---------------------------------------------------------------------------
#
# The cluster-quality / outlier-score shape: each vector's squared
# distance to ITS label's centroid, exact rational — with centroid
# (s_d/n) the distance is sum_d (x_d*n - s_d)^2 / n^2, so the gate
# carries (num, den) int64 plus ONE float division.  Scale 1e4 keeps
# the worst-case sum (|x|<=0.6, n<=5000, 64 dims) within int64.
# Plan: one centroid aggregate (labels x dims slim rows, the
# label_centroids physics), broadcast of that vocabulary-bounded table,
# then a pure vectorized map over the streaming vector column.

VC_SCALE = 10_000


def q_vec_to_centroid(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.ann import embeddings_to_matrix

    def partials(batch: pa.Table) -> pa.Table:
        e4 = np.floor(embeddings_to_matrix(batch) * float(VC_SCALE)).astype(np.int64)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(labels, return_inverse=True)
        dim = e4.shape[1]
        sums = np.zeros((len(keys), dim), dtype=np.int64)
        np.add.at(sums, inv, e4)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(keys, dim), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(keys)), type=pa.int64()),
                "s": pa.array(sums.ravel(), type=pa.int64()),
                "n": pa.array(np.repeat(n, dim), type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"])
    cent = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum(on="s", alias_name="s"), Sum(on="n", alias_name="n"))
        .take_all()  # labels x dims — vocabulary-bounded, broadcast below
    )
    labels = sorted({int(r["label"]) for r in cent})
    dim = 1 + max(int(r["dim"]) for r in cent)
    smat = np.zeros((len(labels), dim), dtype=np.int64)
    nvec = np.zeros(len(labels), dtype=np.int64)
    lix = {l: i for i, l in enumerate(labels)}
    for r in cent:
        smat[lix[int(r["label"])], int(r["dim"])] = int(r["s"])
        nvec[lix[int(r["label"])]] = int(r["n"])
    ref = ray.put((np.array(labels, dtype=np.int64), smat, nvec))

    def score(batch: pa.Table) -> pa.Table:
        labs, sm, nv = ray.get(ref)
        e4 = np.floor(embeddings_to_matrix(batch) * float(VC_SCALE)).astype(np.int64)
        lb = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.searchsorted(labs, lb)
        n = nv[li]
        diff = e4 * n[:, None] - sm[li]
        num = (diff * diff).sum(axis=1)
        den = n * n
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "label": pa.array(lb, type=pa.int64()),
                "d2_num": pa.array(num, type=pa.int64()),
                "d2_den": pa.array(den, type=pa.int64()),
                "d2": pa.array(num.astype(np.float64) / den.astype(np.float64), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


SQL_VEC_TO_CENTROID = f"""
WITH x AS (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {VC_SCALE}.0) AS BIGINT) AS e4
  FROM embeddings),
c AS (SELECT label, dim, SUM(e4) AS s, COUNT(*) AS n FROM x GROUP BY label, dim),
d AS (
  SELECT x.vec_id, x.label,
         SUM((x.e4 * c.n - c.s) * (x.e4 * c.n - c.s)) AS num,
         MAX(c.n) * MAX(c.n) AS den
  FROM x JOIN c ON c.label = x.label AND c.dim = x.dim
  GROUP BY x.vec_id, x.label)
SELECT vec_id, label,
       CAST(num AS BIGINT) AS d2_num,
       CAST(den AS BIGINT) AS d2_den,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS d2
FROM d
"""


# ---------------------------------------------------------------------------
# word lift: association strength with an exact rational threshold
# ---------------------------------------------------------------------------
#
# word_cooc's counting physics promoted to ASSOCIATION MINING: emit the
# word pairs whose lift n_docs*c_ab / (c_a*c_b) clears LIFT_NUM/LIFT_DEN,
# decided by the EXACT cross-multiplied comparison
# LIFT_DEN*n*c_ab >= LIFT_NUM*c_a*c_b — no float ratio is ever
# compared, so threshold boundary cases can't diverge from the oracle.
# (The synthetic corpus is near-independent — max observed lift ~1.21 —
# so the threshold sits at 1.03: non-trivial at EVERY sf tier — the
# max observed lift falls toward 1 as the corpus grows.  At 10^9+ docs
# the cross products outgrow int64; the scale path compares in
# arbitrary-precision Python ints inside the same filter.)  The pair stream comes from the shared
# per-batch distinct-pair partials; the word marginals are one
# vocabulary-bounded Count aggregate broadcast into the final
# vectorized filter map.

LIFT_NUM, LIFT_DEN = 103, 100


def q_word_lift(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def df_partials(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column("text").combine_chunks(), " ")
        wa = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        offs = wa.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        enc = wa.values.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        n_docs = len(offs) - 1
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        dk = np.unique(doc_idx * np.int64(1 << 32) + codes)
        c = (dk & np.int64((1 << 32) - 1)).astype(np.int64)
        keys, cnt = np.unique(c, return_counts=True)
        out = pa.table(
            {
                "w": pa.array(vocab[keys].tolist(), type=pa.string()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
                "docs": pa.array(
                    np.concatenate(([n_docs], np.zeros(len(keys) - 1, np.int64)))
                    if len(keys)
                    else np.zeros(0, np.int64),
                    type=pa.int64(),
                ),
            }
        )
        return out

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    df = (
        ds.map_batches(df_partials, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum(on="c", alias_name="c"), Sum(on="docs", alias_name="docs"))
        .take_all()  # vocabulary-bounded, driver-small
    )
    n_total = sum(int(r["docs"]) for r in df)
    words = np.array([r["w"] for r in df], dtype=object)
    cs = np.array([int(r["c"]) for r in df], dtype=np.int64)
    order = np.argsort(words.astype(str), kind="stable")
    words, cs = words[order], cs[order]
    ref = ray.put((words.astype(str), cs, n_total))

    pairs = (
        ds.map_batches(_cooc_pair_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum(on="n", alias_name="n_ab"))
    )

    def lift_filter(batch: pa.Table) -> pa.Table:
        wv, cv, n = ray.get(ref)
        w1 = batch.column("w1").to_numpy(zero_copy_only=False).astype(str)
        w2 = batch.column("w2").to_numpy(zero_copy_only=False).astype(str)
        nab = batch.column("n_ab").to_numpy(zero_copy_only=False)
        ca = cv[np.searchsorted(wv, w1)]
        cb = cv[np.searchsorted(wv, w2)]
        # int64 fast path only while both cross products provably fit;
        # past ~10^9 docs the comparison reruns in arbitrary-precision
        # Python ints (the scale path the family comment promises).
        if len(nab) and (
            LIFT_DEN * n * int(nab.max()) >= 2**62
            or LIFT_NUM * int(ca.max()) * int(cb.max()) >= 2**62
        ):
            keep = np.fromiter(
                (
                    LIFT_DEN * n * int(x) >= LIFT_NUM * int(a) * int(b)
                    for x, a, b in zip(nab, ca, cb)
                ),
                dtype=bool,
                count=len(nab),
            )
        else:
            keep = LIFT_DEN * n * nab >= LIFT_NUM * ca * cb
        return pa.table(
            {
                "w1": batch.column("w1").filter(pa.array(keep)),
                "w2": batch.column("w2").filter(pa.array(keep)),
                "n_ab": pa.array(nab[keep], type=pa.int64()),
                "n_a": pa.array(ca[keep], type=pa.int64()),
                "n_b": pa.array(cb[keep], type=pa.int64()),
            }
        )

    return pairs.map_batches(lift_filter, batch_format="pyarrow")


SQL_WORD_LIFT = f"""
WITH w AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
df AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
n AS (SELECT COUNT(*) AS n FROM documents),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w)
SELECT p.w1, p.w2,
       CAST(p.c AS BIGINT) AS n_ab,
       CAST(ca.c AS BIGINT) AS n_a,
       CAST(cb.c AS BIGINT) AS n_b
FROM pairs p
JOIN df ca ON ca.w = p.w1
JOIN df cb ON cb.w = p.w2
CROSS JOIN n
WHERE {LIFT_DEN} * n.n * p.c >= {LIFT_NUM} * ca.c * cb.c
"""


# ---------------------------------------------------------------------------
# per-user linear regression (REGR_SLOPE / REGR_INTERCEPT shape)
# ---------------------------------------------------------------------------
#
# OLS value-vs-time trend per user, with NO float accumulation: the
# five moment sums (n, Sx, Sy, Sxy, Sxx) are exact int64 partials over
# x = whole MINUTES since 2024-01-01 and y = value cents, merged by
# native Sums.  Minute resolution keeps every merged moment strictly
# below 2^53 (asserted), so both engines convert them to DOUBLE
# exactly; slope and intercept are then the IDENTICAL IEEE operation
# sequence on both sides — n·Sxy − Sx·Sy over n·Sxx − Sx², then
# (Sy − slope·Sx)/n — which is bit-deterministic given exact inputs.
# (The first cut kept an exact-rational HUGEINT form; DuckDB's
# HUGEINT→DOUBLE cast is not correctly rounded above 2^63 and diverged
# from Python by 1 ulp on 0.27% of rows at sf0.1 — pinned by the gate.)
# Degenerate groups (constant x) yield NULLs on both sides.

_REGR_T0_MIN = 1_704_067_200 // 60  # 2024-01-01 in epoch minutes


def q_regr_user(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = us // 60_000_000 - _REGR_T0_MIN
        y = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        # representability domain (see header): minute-resolution x and
        # cent y keep every MERGED moment under 2^53
        assert x.size == 0 or (x.min() >= 0 and x.max() < 2**26)
        assert y.size == 0 or (np.abs(y).max() < 2**26)
        keys, inv = np.unique(uid, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        out = {"user_id": pa.array(keys, type=pa.int64()), "n": pa.array(n, type=pa.int64())}
        for name, v in (("sx", x), ("sy", y), ("sxy", x * y), ("sxx", x * x)):
            acc = np.zeros(len(keys), dtype=np.int64)
            np.add.at(acc, inv, v)
            out[name] = pa.array(acc, type=pa.int64())
        return pa.table(out)

    mart = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum(on="n", alias_name="n"),
            Sum(on="sx", alias_name="sx"),
            Sum(on="sy", alias_name="sy"),
            Sum(on="sxy", alias_name="sxy"),
            Sum(on="sxx", alias_name="sxx"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        ni = batch.column("n").to_numpy(zero_copy_only=False)
        sxi = batch.column("sx").to_numpy(zero_copy_only=False)
        syi = batch.column("sy").to_numpy(zero_copy_only=False)
        sxyi = batch.column("sxy").to_numpy(zero_copy_only=False)
        sxxi = batch.column("sxx").to_numpy(zero_copy_only=False)
        for v in (sxyi, sxxi):  # merged moments must convert to double exactly
            assert v.size == 0 or np.abs(v).max() < 2**53
        n, sx, sy = ni.astype(np.float64), sxi.astype(np.float64), syi.astype(np.float64)
        sxy, sxx = sxyi.astype(np.float64), sxxi.astype(np.float64)
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / den
            icpt = (sy - slope * sx) / n
        ok = den != 0.0
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n": batch.column("n"),
                "slope": pa.array(np.where(ok, slope, np.nan), type=pa.float64(), mask=~ok),
                "intercept": pa.array(np.where(ok, icpt, np.nan), type=pa.float64(), mask=~ok),
            }
        )

    return mart.map_batches(finish, batch_format="pyarrow")


SQL_REGR_USER = f"""
WITH v AS (
  SELECT user_id,
         epoch_us(ts) // 60000000 - {_REGR_T0_MIN} AS x,
         CAST(floor(value * 100.0) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM v GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END AS intercept
FROM m
"""


# ---------------------------------------------------------------------------
# character-class histogram per language (corpus-audit shape)
# ---------------------------------------------------------------------------
#
# Per language: total codepoints and how many are alphabetic, digits,
# or whitespace — the character-level corpus audit.  Pure zero-copy
# Arrow: three RE2 ``count_substring_regex`` kernels + ``utf8_length``
# per batch, then a vocabulary-bounded Sum shuffle (one row per
# (lang, batch)).  Single-char classes make "matches" == "characters",
# so DuckDB's length(regexp_replace(...)) difference reproduces each
# count exactly.

def q_char_class_hist(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        total = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        alpha = pc.count_substring_regex(text, "[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.int64)
        digit = pc.count_substring_regex(text, "[0-9]").to_numpy(zero_copy_only=False).astype(np.int64)
        space = pc.count_substring_regex(text, r"\s").to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(lang, return_inverse=True)
        out = {"lang": pa.array(keys.tolist(), type=pa.string())}
        for name, v in (("n_chars", total), ("n_alpha", alpha), ("n_digit", digit), ("n_space", space)):
            acc = np.zeros(len(keys), dtype=np.int64)
            np.add.at(acc, inv, v)
            out[name] = pa.array(acc, type=pa.int64())
        return pa.table(out)

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum(on="n_chars", alias_name="n_chars"),
            Sum(on="n_alpha", alias_name="n_alpha"),
            Sum(on="n_digit", alias_name="n_digit"),
            Sum(on="n_space", alias_name="n_space"),
        )
    )


SQL_CHAR_CLASS_HIST = r"""
SELECT lang,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS BIGINT) AS n_alpha,
       CAST(SUM(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT) AS n_digit,
       CAST(SUM(length(text) - length(regexp_replace(text, '\s', '', 'g'))) AS BIGINT) AS n_space
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# grouped Mann-Whitney rank-sum (the nonparametric two-sample primitive)
# ---------------------------------------------------------------------------
#
# Per-language Wilcoxon/Mann-Whitney rank-sum of n_chars against the
# GLOBAL ranking with midrank tie handling — the hypothesis-test
# primitive under every "does corpus slice A differ from B" check.
# Physics: the global value histogram is one Count shuffle over the
# BOUNDED n_chars domain (the percent_rank/dense_rank fold), broadcast
# as (value, 2*cl + c + 1) — DOUBLED so every midrank is an int64 and
# the only float op is ONE final division by 2.0 (an exact power of
# two, so Ray and DuckDB round identically).  Per-batch per-lang
# partial sums -> one vocabulary-bounded Sum shuffle -> finish.
#   midrank(v) = cl(v) + (c(v)+1)/2      (cl = rows < v, c = ties)
#   ranksum    = sum midrank             = num / 2
#   U          = ranksum - n(n+1)/2      = (num - n(n+1)) / 2

def q_ranksum(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="c"))
        .take_all()  # value-domain-bounded, driver-small
    )
    vals = np.array([r["n_chars"] for r in counts], dtype=np.int64)
    cs = np.array([r["c"] for r in counts], dtype=np.int64)
    o = np.argsort(vals)
    vals, cs = vals[o], cs[o]
    cl = np.concatenate(([0], np.cumsum(cs)[:-1]))
    ref = ray.put((vals, 2 * cl + cs + 1))  # doubled midranks: exact int64

    def partials(batch: pa.Table) -> pa.Table:
        v, mid2 = ray.get(ref)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        m2 = mid2[np.searchsorted(v, x)]
        keys, inv = np.unique(lang, return_inverse=True)
        num = np.zeros(len(keys), dtype=np.int64)
        np.add.at(num, inv, m2)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(keys.tolist(), type=pa.string()),
                "num": pa.array(num, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum(on="num", alias_name="num"), Sum(on="n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        num = batch.column("num").to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n": pa.array(n, type=pa.int64()),
                "ranksum": pa.array(num / 2.0, type=pa.float64()),
                "u_stat": pa.array((num - n * (n + 1)) / 2.0, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_RANKSUM = """
WITH h AS (
  SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
h2 AS (
  SELECT n_chars, c,
         CAST(SUM(c) OVER (ORDER BY n_chars) - c AS BIGINT) AS cl
  FROM h),
g AS (
  SELECT d.lang, COUNT(*) AS n,
         CAST(SUM(2 * h2.cl + h2.c + 1) AS BIGINT) AS num
  FROM documents d JOIN h2 USING (n_chars)
  GROUP BY d.lang)
SELECT lang, n, num / 2.0 AS ranksum,
       (num - n * (n + 1)) / 2.0 AS u_stat
FROM g
"""


# ---------------------------------------------------------------------------
# per-source language impurity (Gini impurity — the split criterion)
# ---------------------------------------------------------------------------
#
# Gini impurity 1 - sum(p_i^2) of each source's language mix — the
# decision-tree split criterion and the standard "how mixed is this
# corpus slice" audit (entropy needs a log, whose libm rounding differs
# across engines; impurity is RATIONAL and gates exactly).  Physics:
# per-batch (source, lang) counts -> one vocab-bounded Sum shuffle ->
# per-source map_groups folds n and sum(c^2) in int64 (domain assert:
# c < 3e9 keeps c^2 in int64) and the float tail is the
# division-by-parts spelling  1.0 - c2/n/n  evaluated in the SAME op
# order both sides.

def q_lang_impurity(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(src.astype(str), "\x1f"), lang.astype(str))
        keys, cnt = np.unique(key, return_counts=True)
        parts = [k.split("\x1f") for k in keys.tolist()]
        return pa.table(
            {
                "source": pa.array([p[0] for p in parts], type=pa.string()),
                "lang": pa.array([p[1] for p in parts], type=pa.string()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    mart = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum(on="c", alias_name="c"))
    )

    def fold(group: pa.Table) -> pa.Table:
        c = group.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        # domain assert: c^2 must fit int64 (holds to ~3e9 docs per slice)
        assert c.size == 0 or int(c.max()) < 3_000_000_000
        n = int(c.sum())
        c2 = int((c * c).sum())
        nf = float(n)
        return pa.table(
            {
                "source": group.column("source").slice(0, 1),
                "n": pa.array([n], type=pa.int64()),
                "sum_c2": pa.array([c2], type=pa.int64()),
                "impurity": pa.array([1.0 - float(c2) / nf / nf], type=pa.float64()),
            }
        )

    return mart.groupby("source").map_groups(fold, batch_format="pyarrow")


SQL_LANG_IMPURITY = """
WITH cl AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n,
       CAST(SUM(c * c) AS BIGINT) AS sum_c2,
       1.0 - CAST(SUM(c * c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
           / CAST(SUM(c) AS DOUBLE) AS impurity
FROM cl GROUP BY source
"""


# ---------------------------------------------------------------------------
# cross-source vocabulary overlap (pairwise corpus-slice Jaccard)
# ---------------------------------------------------------------------------
#
# For every unordered pair of sources: the Jaccard similarity of their
# DISTINCT token vocabularies — the "are these two crawls the same
# register of text" audit that decides whether slices can share a
# tokenizer/vocab budget.  Physics: the house tokenizer's per-batch
# distinct partials (``_term_partials`` with the group column renamed
# to reuse the exact same Arrow kernel path) -> one (source, term)
# distinct shuffle -> per-TERM map_groups emits the term's canonical
# source pairs (fan-out bounded by sources^2 per term, sources ~ 20)
# -> pair-keyed Count.  Vocab sizes and the intersection mart are both
# pair/source-bounded, so the final assembly (including zero-overlap
# pairs, which a join would drop) is a driver fold over <= S^2 rows.

def q_vocab_overlap(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    def rename_in(batch: pa.Table) -> pa.Table:
        return pa.table({"lang": batch.column("source"), "text": batch.column("text")})

    mart = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(rename_in, batch_format="pyarrow")
        .map_batches(_term_partials, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .count()
        .map_batches(
            lambda t: pa.table({"source": t.column("lang"), "term": t.column("term")}),
            batch_format="pyarrow",
        )
        .materialize()  # distinct (source, term): vocab-bounded, consumed twice
    )
    sizes = {
        r["source"]: r["count()"]
        for r in mart.groupby("source").count().take_all()  # source-bounded
    }

    def pairs(group: pa.Table) -> pa.Table:
        src = sorted(set(group.column("source").to_pylist()))
        sa, sb = [], []
        for i in range(len(src)):
            for j in range(i + 1, len(src)):
                sa.append(src[i])
                sb.append(src[j])
        return pa.table(
            {
                "sa": pa.array(sa, type=pa.string()),
                "sb": pa.array(sb, type=pa.string()),
            }
        )

    inter = {
        (r["sa"], r["sb"]): r["n_inter"]
        for r in mart.groupby("term")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["sa", "sb"])
        .aggregate(Count(alias_name="n_inter"))
        .take_all()  # pair-bounded: <= sources^2 rows
    }
    srcs = sorted(sizes)
    rows = {"sa": [], "sb": [], "n_inter": [], "v_a": [], "v_b": [], "jaccard": []}
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            ni = int(inter.get((a, b), 0))
            va, vb = int(sizes[a]), int(sizes[b])
            rows["sa"].append(a)
            rows["sb"].append(b)
            rows["n_inter"].append(ni)
            rows["v_a"].append(va)
            rows["v_b"].append(vb)
            rows["jaccard"].append(ni / (va + vb - ni))
    out = pa.table(
        {
            "sa": pa.array(rows["sa"], type=pa.string()),
            "sb": pa.array(rows["sb"], type=pa.string()),
            "n_inter": pa.array(rows["n_inter"], type=pa.int64()),
            "v_a": pa.array(rows["v_a"], type=pa.int64()),
            "v_b": pa.array(rows["v_b"], type=pa.int64()),
            "jaccard": pa.array(rows["jaccard"], type=pa.float64()),
        }
    )
    import ray.data as rd2

    return rd2.from_arrow(out)


SQL_VOCAB_OVERLAP = """
WITH terms AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents),
t AS (SELECT source, term FROM terms WHERE term <> ''),
v AS (SELECT source, COUNT(*) AS nv FROM t GROUP BY 1),
inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_inter
  FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT va.source AS sa, vb.source AS sb,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(va.nv AS BIGINT) AS v_a, CAST(vb.nv AS BIGINT) AS v_b,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / (va.nv + vb.nv - COALESCE(i.n_inter, 0)) AS jaccard
FROM v va
JOIN v vb ON va.source < vb.source
LEFT JOIN inter i ON i.sa = va.source AND i.sb = vb.source
"""


# ---------------------------------------------------------------------------
# k-anonymity audit (quasi-identifier group-size privacy report)
# ---------------------------------------------------------------------------
#
# The privacy gate run before releasing a training corpus: bucket every
# document by its quasi-identifier tuple (lang, source, n_chars//100)
# and report, per (lang, source) slice, how many buckets fall below
# k = 5 and how many rows sit in those re-identifiable buckets.  The
# aggregate-report shape stays non-degenerate at every scale (the raw
# list of risky groups shrinks as data grows).  Physics: per-batch
# 3-key counts -> one vocab-bounded Sum shuffle -> per-slice map_groups
# fold; nothing leaves the bounded quasi-identifier lattice.

K_ANON = 5


def q_k_anon_audit(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        b = (batch.column("n_chars").to_numpy(zero_copy_only=False) // 100).astype(np.int64)
        key = np.char.add(
            np.char.add(np.char.add(lang.astype(str), "\x1f"), src.astype(str)),
            np.char.add("\x1f", b.astype(str)),
        )
        keys, cnt = np.unique(key, return_counts=True)
        parts = [k.split("\x1f") for k in keys.tolist()]
        return pa.table(
            {
                "lang": pa.array([p[0] for p in parts], type=pa.string()),
                "source": pa.array([p[1] for p in parts], type=pa.string()),
                "bucket": pa.array([int(p[2]) for p in parts], type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    mart = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "source", "bucket"])
        .aggregate(Sum(on="c", alias_name="c"))
    )

    def fold(group: pa.Table) -> pa.Table:
        c = group.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        small = c < K_ANON
        return pa.table(
            {
                "lang": group.column("lang").slice(0, 1),
                "source": group.column("source").slice(0, 1),
                "n_groups": pa.array([len(c)], type=pa.int64()),
                "n_small": pa.array([int(small.sum())], type=pa.int64()),
                "rows_at_risk": pa.array([int(c[small].sum())], type=pa.int64()),
            }
        )

    return mart.groupby(["lang", "source"]).map_groups(fold, batch_format="pyarrow")


SQL_K_ANON_AUDIT = f"""
WITH g AS (
  SELECT lang, source, n_chars // 100 AS bucket, COUNT(*) AS c
  FROM documents GROUP BY 1, 2, 3)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (c < {K_ANON}) AS BIGINT) AS n_small,
       CAST(COALESCE(SUM(c) FILTER (c < {K_ANON}), 0) AS BIGINT) AS rows_at_risk
FROM g GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# token-length histogram (tokenizer-design corpus audit)
# ---------------------------------------------------------------------------
#
# Per-language distribution of token lengths over ALL occurrences (not
# the per-doc distinct of term_df) — the audit that sizes subword
# vocabularies and catches concatenation corruption (a spike of
# 50-char "words" means the cleaner broke).  Zero-copy Arrow path:
# utf8_lower -> split_pattern_regex -> list_flatten -> utf8_length;
# the (lang, len) lattice is vocabulary-bounded, so the Sum shuffle
# carries langs x max_len rows per block.

def q_token_len_hist(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        lang = batch.column("lang").combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(text), _TERM_RE.pattern)
        flat = pc.list_flatten(toks)
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
        keep = ln > 0
        ln, doc_of = ln[keep], doc_of[keep]
        lenc = pc.dictionary_encode(lang)
        lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[doc_of]
        key = lcodes * 4096 + ln  # token length < 4096 by construction
        keys, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": lenc.dictionary.take(pa.array(keys // 4096, type=pa.int64())),
                "len": pa.array(keys % 4096, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "len"])
        .aggregate(Sum(on="n", alias_name="n"))
    )


SQL_TOKEN_LEN_HIST = """
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
  FROM documents)
SELECT lang, CAST(length(t) AS BIGINT) AS len, CAST(COUNT(*) AS BIGINT) AS n
FROM toks WHERE t <> '' GROUP BY 1, 2
"""
