"""Deduplication queries over the documents table, with value-level DuckDB
oracles: exact content dedup, MinHash signatures, LSH buckets, LSH-verified
near-dup pairs, SimHash fingerprints, and exact n-gram Jaccard pairs.

All thresholds are calibrated to the synthetic corpus (31-word vocabulary,
one planted bigram-level near-duplicate pair at sf0.01); real pipelines run
the same operators with production thresholds (e.g. Jaccard 0.8 on 5-gram
shingles). The operator mechanics -- shingle coding, min-wise hashing,
banding, bucket-local joins -- are identical at any scale.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ddsketch_spark.functions.hashing import FOLD31, hash_params, hash_sql, mix_sql
from ddsketch_spark.operators import dedup as dd
from ddsketch_spark.operators.text_ops import FP_BASE, FP_MOD, tokenize
from ddsketch_spark.plans.tokens_suite import VOCAB_SQL
from ddsketch_spark.sources.tables import read_table

NUM_HASHES = dd.DEFAULT_NUM_HASHES  # 16
BANDS = dd.DEFAULT_BANDS  # 4 bands x 4 rows
_JACCARD_TAU = 0.9  # unigram within-source pairs (calibrated: ~800 @ sf0.01)
_LSH_VERIFY_TAU = 0.5  # bigram candidates: keeps the planted near-dup


# SQL: per-doc ordered token arrays + bigram shingles, from the shared
# vocabulary coding (see tokens_suite).
_TOKS_SQL = f"""
toks AS (
  SELECT wp.doc_id, wp.source, list(v.token ORDER BY wp.pos) AS tokens
  FROM (
    SELECT doc_id, source,
           UNNEST(string_split(text, ' ')) AS word,
           UNNEST(generate_series(1, len(string_split(text, ' ')))) AS pos
    FROM documents
  ) wp JOIN ({VOCAB_SQL}) v USING (word)
  GROUP BY wp.doc_id, wp.source
),
vsz AS (SELECT COUNT(*) + 1 AS base FROM ({VOCAB_SQL})),
shingles AS (
  SELECT doc_id, UNNEST(list_distinct(
    [tokens[i] * base + tokens[i+1] FOR i IN generate_series(1, len(tokens)-1)]
  )) AS shingle
  FROM toks, vsz
)"""


def _docs_tokens(spark: SparkSession, sf_dir: str):
    # tokenize auto-selects literal-map vs broadcast-join coding by vocab
    # size (operators.text_ops); identical tokens either way
    docs = read_table(spark, sf_dir, "documents")
    toked, vsize = tokenize(docs)
    return toked.select("doc_id", "source", "tokens"), vsize


def _bigram_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks, vsize = _docs_tokens(spark, sf_dir)
    return dd.doc_shingles(toks, "tokens", 2, vsize)


# 1. exact content dedup -----------------------------------------------------

def _exact_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(read_table(spark, sf_dir, "documents"))


_EXACT_SQL = """
SELECT MIN(doc_id) AS keeper, COUNT(*) - 1 AS n_dupes, COUNT(*) AS n_docs
FROM documents GROUP BY length(text), md5(text)
"""


# 2. MinHash signatures ------------------------------------------------------

def _minhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_signatures(_bigram_shingles(spark, sf_dir))


def _minhash_oracle_sql() -> str:
    lin_cols = ", ".join(
        f"{hash_sql('shingle', a, b)} AS h{j}"
        for j, (a, b) in enumerate(hash_params(NUM_HASHES, 42))
    )
    mins = ", ".join(
        f"MIN({mix_sql(f'h{j}')}) AS m{j}" for j in range(NUM_HASHES)
    )
    return f"""
WITH {_TOKS_SQL},
lin AS (SELECT doc_id, {lin_cols} FROM shingles)
SELECT doc_id, {mins} FROM lin GROUP BY doc_id
"""


# 3. LSH band buckets --------------------------------------------------------

def _lsh_buckets_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dd.minhash_signatures(_bigram_shingles(spark, sf_dir))
    return dd.lsh_buckets(sigs)


def _band_bucket_sql(cols: list[str]) -> str:
    acc = "0"
    for c in cols:
        acc = f"(({acc}) * {FP_BASE} + ({c} % {FOLD31})) % {FP_MOD}"
    return acc


def _bands_union_sql() -> str:
    r = NUM_HASHES // BANDS
    return " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, "
        f"{_band_bucket_sql([f'm{band * r + i}' for i in range(r)])} AS bucket FROM sigs"
        for band in range(BANDS)
    )


def _lsh_buckets_oracle_sql() -> str:
    return f"WITH sigs AS ({_minhash_oracle_sql().strip()}) {_bands_union_sql()}"


# 4. LSH candidates, verified by exact bigram Jaccard ------------------------

def _lsh_pairs_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingle stream feeds three consumers (signatures, intersection,
    # sizes) -- persist it so the explode runs once, not per consumer.
    # the candidate-pair table feeds FOUR consumers inside jaccard_pairs
    # (two semi-join prunes, the candidate filter, the final inner join):
    # persist it too, or the whole minhash+bucket-join subtree recomputes
    # once per consumer (measured 6x wall-clock at sf0.1)
    sh = _bigram_shingles(spark, sf_dir).persist()
    pairs = dd.lsh_candidate_pairs(
        dd.lsh_buckets(dd.minhash_signatures(sh))
    ).persist()
    return dd.jaccard_pairs(sh, pairs=pairs, threshold=_LSH_VERIFY_TAU)


def _lsh_pairs_oracle_sql() -> str:
    return f"""
WITH sigs AS ({_minhash_oracle_sql().strip()}),
buckets AS ({_bands_union_sql()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
{_TOKS_SQL.strip().lstrip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles s1 JOIN shingles s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  JOIN cand c ON c.doc_a = s1.doc_id AND c.doc_b = s2.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
       i.inter::DOUBLE / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter::DOUBLE / (sa.sz + sb.sz - i.inter) >= CAST({_LSH_VERIFY_TAU!r} AS DOUBLE)
"""


# 4b. duplicate clusters (connected components over verified pairs) ----------

def _clusters_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    pairs = _lsh_pairs_spark(spark, sf_dir).select("doc_a", "doc_b")
    return dd.connected_components(docs, pairs)


def _clusters_oracle_sql() -> str:
    # transitive closure of min labels over the symmetric near-dup edge
    # list; MIN per node == min doc id in the connected component, exactly
    # what min-label propagation converges to
    return f"""
WITH RECURSIVE
pairs AS ({_lsh_pairs_oracle_sql().strip()}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
"""


# 5. SimHash fingerprints ----------------------------------------------------

def _simhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks, _ = _docs_tokens(spark, sf_dir)
    return dd.simhash(toks)


def _simhash_oracle_sql() -> str:
    a, b = hash_params(1, 43)[0]
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (hm >> {bit}) & 1 = 1 THEN cnt ELSE -cnt END) AS s{bit}"
        for bit in range(dd.SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{bit} > 0 THEN {1 << bit} ELSE 0 END)"
        for bit in range(dd.SIMHASH_BITS)
    )
    return f"""
WITH {_TOKS_SQL},
stream AS (SELECT doc_id, UNNEST(tokens) AS token FROM toks),
counted AS (SELECT doc_id, token, COUNT(*) AS cnt FROM stream GROUP BY 1, 2),
hashed AS (
  SELECT doc_id, cnt, {mix_sql(hash_sql('token', a, b))} AS hm FROM counted
),
sums AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
SELECT doc_id, {fp} AS simhash FROM sums
"""


# 6. exact unigram Jaccard pairs within source -------------------------------

def _jaccard_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks, vsize = _docs_tokens(spark, sf_dir)
    sh = dd.doc_shingles(toks, "tokens", 1, vsize, extra_cols=("source",))
    return dd.jaccard_pairs(sh, group_col="source", threshold=_JACCARD_TAU)


def _jaccard_oracle_sql() -> str:
    return f"""
WITH {_TOKS_SQL},
uni AS (
  SELECT doc_id, source, UNNEST(list_distinct(tokens)) AS shingle FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM uni GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM uni a JOIN uni b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
       i.inter::DOUBLE / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter::DOUBLE / (sa.sz + sb.sz - i.inter) >= CAST({_JACCARD_TAU!r} AS DOUBLE)
"""


# 7. benchmark decontamination ------------------------------------------------
#
# Eval set = every doc with doc_id % 41 == 0 (a deterministic stand-in for a
# benchmark suite); corpus = everything else. A corpus doc is contaminated
# when it shares >= 1 trigram shingle with any eval doc. n_hits is an exact
# integer (distinct shared trigrams), so the oracle is value-level.

_DECON_MOD = 41


def _decontam_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks, vsize = _docs_tokens(spark, sf_dir)
    # the trigram stream feeds two consumers (eval + corpus split): persist
    # so tokenization + explode run once.  Cache lifetime (ADVICE r4): `sh`
    # stays persisted after return (it feeds the returned lazy DataFrame);
    # suite runners bound accumulation with spark.catalog.clearCache()
    # between queries (bench.py does).  At 100 TB pass hits_only=True and
    # recompute the two shingle streams instead -- a doc-shingle cache is
    # data-sized and the recompute is one extra columnar scan.
    sh = dd.doc_shingles(toks, "tokens", 3, vsize).persist()
    eval_sh = sh.where(F.col("doc_id") % _DECON_MOD == 0)
    corpus_sh = sh.where(F.col("doc_id") % _DECON_MOD != 0)
    corpus_docs = read_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _DECON_MOD != 0
    )
    return dd.decontaminate(corpus_sh, eval_sh, corpus_docs)


def _decontam_oracle_sql() -> str:
    bigram = "[tokens[i] * base + tokens[i+1] FOR i IN generate_series(1, len(tokens)-1)]"
    trigram = (
        "[(tokens[i] * base + tokens[i+1]) * base + tokens[i+2] "
        "FOR i IN generate_series(1, len(tokens)-2)]"
    )
    assert bigram in _TOKS_SQL, "shared toks CTE changed; update trigram rewrite"
    toks3 = _TOKS_SQL.replace(bigram, trigram)
    return f"""
WITH {toks3},
eval_sh AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % {_DECON_MOD} = 0),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_hits
  FROM shingles s JOIN eval_sh e USING (shingle)
  WHERE s.doc_id % {_DECON_MOD} <> 0
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_DECON_MOD} <> 0
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact_content": _exact_spark,
        "dedup_minhash_signatures": _minhash_spark,
        "dedup_lsh_buckets": _lsh_buckets_spark,
        "dedup_lsh_pairs_verified": _lsh_pairs_spark,
        "dedup_duplicate_clusters": _clusters_spark,
        "dedup_simhash": _simhash_spark,
        "dedup_jaccard_pairs_by_source": _jaccard_spark,
        "decontam_ngram_overlap": _decontam_spark,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact_content": _EXACT_SQL,
        "dedup_minhash_signatures": _minhash_oracle_sql(),
        "dedup_lsh_buckets": _lsh_buckets_oracle_sql(),
        "dedup_lsh_pairs_verified": _lsh_pairs_oracle_sql(),
        "dedup_duplicate_clusters": _clusters_oracle_sql(),
        "dedup_simhash": _simhash_oracle_sql(),
        "dedup_jaccard_pairs_by_source": _jaccard_oracle_sql(),
        "decontam_ngram_overlap": _decontam_oracle_sql(),
    }
