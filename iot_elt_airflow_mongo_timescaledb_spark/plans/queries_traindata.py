"""Training-data pipeline queries — dedup / similarity / text analysis /
multimodal over the ``documents`` and ``embeddings`` tables.

Oracle strategy: every hash is an md5 hex string (identical in Spark and
DuckDB), minima over digests are lexicographic, embeddings are cast
float→double before arithmetic, and ratios are rounded — so even the
MinHash-LSH chain is reproduced exactly by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import packing as P
from ..operators import similarity as S
from ..operators import text as X
from ..operators.multimodal import attach_binary, extract_features
from .registry import query, table

# ---------------------------------------------------------------------------
# shared oracle-SQL fragments (DuckDB)
# ---------------------------------------------------------------------------

_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

_K = 8
_BANDS_N = 4

# the exact-dup pre-guard: the near-dup (LSH) chain only ever sees one
# keeper per distinct content — a k-identical-doc family contributes
# O(k) exact-dup edges, never O(k²) LSH candidate pairs
_KEEPERS = f"SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM_SQL})"

_DOCS_KEPT = f"SELECT * FROM documents WHERE doc_id IN ({_KEEPERS})"


def _words_sql(src: str) -> str:
    return (
        r"SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws"
        f" FROM ({src})"
    )


def _shingles_sql(src: str) -> str:
    return rf"""SELECT DISTINCT doc_id,
       unnest(list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
    FROM ({_words_sql(src)}) WHERE len(ws) >= 3"""


def _sig_sql(src: str) -> str:
    return (
        "SELECT doc_id, "
        + ", ".join(f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(_K))
        + f" FROM ({_shingles_sql(src)}) GROUP BY doc_id"
    )


# full-corpus signature table (per-doc map — no pair blow-up risk)
_SHINGLES = _shingles_sql("SELECT * FROM documents")
_SIG = _sig_sql("SELECT * FROM documents")

# keeper-only chain feeding every pair-producing query
_SHINGLES_KEPT = _shingles_sql(_DOCS_KEPT)
_SIG_KEPT = _sig_sql(_DOCS_KEPT)

_BAND_KEY_CASE = (
    "CASE b.band "
    + " ".join(
        f"WHEN {b} THEN mh{2 * b} || mh{2 * b + 1}" for b in range(_BANDS_N)
    )
    + " END"
)

def _bands_sql(sig: str) -> str:
    return f"""SELECT doc_id, b.band AS band, {_BAND_KEY_CASE} AS key
    FROM ({sig}), (SELECT unnest([0,1,2,3]) AS band) b"""


def _pairs_sql(doc_src: str) -> str:
    bands = _bands_sql(_sig_sql(doc_src))
    return f"""SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM ({bands}) a JOIN ({bands}) b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""


_BANDS = _bands_sql(_SIG_KEPT)
_PAIRS = _pairs_sql(_DOCS_KEPT)


def _kept_docs(spark, sf_dir):
    """Spark twin of ``_DOCS_KEPT`` — exact-dup keepers only.

    The keeper-id side of the semi-join is a hash-agg output that AQE
    broadcasts when small; the expensive fan-in point of the chain is
    the SIGNATURE table, checkpointed by ``_kept_signature`` below.
    """
    docs = table(spark, sf_dir, "documents")
    keeper_ids = D.exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("keeper_id").alias("doc_id")
    )
    return docs.join(keeper_ids, "doc_id", "left_semi")


def _kept_signature(spark, sf_dir):
    """MinHash signatures of the keeper corpus, ``localCheckpoint``ed.

    The signature table is the fan-in every pair query joins against
    MULTIPLE times (both sides of the banded self-join, then the
    estimate probes): without the cut the whole docs→keepers→shingles→
    signature subtree is embedded once per consumer, and identical
    stages submitted concurrently hit the racy AQE stage-reuse measured
    in round 1 (bimodal 2×-slow runs).  It is also the natural
    materialization tier at corpus scale — |keepers| × k hashes, far
    smaller than the exploded shingle table, distributed across
    executors, computed once per pipeline run.  Same pattern as the LSH
    pair set and the CC edge set.
    """
    sh = D.word_shingles(_kept_docs(spark, sf_dir), "doc_id", "text", n=3)
    return D.minhash_signature(sh, "doc_id", k=_K).localCheckpoint()


# ---------------------------------------------------------------------------
# exact dedup + fingerprints
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM_SQL}) AS fingerprint,
           COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-content md5."""
    return D.exact_dedup_groups(table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id, md5({_NORM_SQL}) AS fp_md5,
           substr(md5({_NORM_SQL}), 1, 16) AS fp_prefix64,
           CAST(floor(length({_NORM_SQL}) / 100) AS BIGINT) AS len_bucket
    FROM documents
    """,
    gate=False,  # md5-fingerprint family: dedup_exact carries the gate (r9 rotation)
)
def doc_fingerprints(spark, sf_dir):
    return X.fingerprints(table(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# MinHash + LSH + verified Jaccard
# ---------------------------------------------------------------------------


@query("minhash_signatures", oracle=_SIG, gate=False)
# ^ demoted in the round-8 rotation: lsh_candidate_pairs exercises the
# same MinHash machinery end-to-end in the gate; this intermediate
# artifact stays hash-oracled via the pytest parity suite
def minhash_signatures(spark, sf_dir):
    """k=8 MinHash signature per doc over word 3-gram shingles."""
    docs = table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", n=3)
    return D.minhash_signature(sh, "doc_id", k=_K)


@query("lsh_candidate_pairs", oracle=_PAIRS)
def lsh_candidate_pairs(spark, sf_dir):
    """Banded LSH (4 bands × 2 rows) near-dup candidate pairs, with the
    exact-dup pre-guard: only content keepers enter the banding, so a
    k-identical family can never emit O(k²) candidates."""
    sig = _kept_signature(spark, sf_dir)
    return D.lsh_candidate_pairs(sig, "doc_id", k=_K, bands=_BANDS_N)


@query(
    "ngram_jaccard_pairs",
    # round-10 gate rotation: lsh_candidate_pairs carries the shingle/
    # band family gate; this row stays pytest-oracle-verified
    gate=False,
    oracle=f"""
    WITH shingles AS ({_SHINGLES_KEPT}), pairs AS ({_PAIRS}),
    inter AS (
      SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
      FROM pairs p
      JOIN shingles sa ON sa.doc_id = p.id_a
      JOIN shingles sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
      GROUP BY 1, 2),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY 1)
    SELECT i.id_a AS id_a, i.id_b AS id_b,
           ROUND(i.n_inter / (na.n + nb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.id_a
    JOIN sizes nb ON nb.doc_id = i.id_b
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard, verified on LSH candidates only (the
    scalable shape: exact-dup keepers → inverted-index probe, never
    all-pairs).

    The probe's shingle table is built from CANDIDATE docs only (a
    semi-join on the pair ids) rather than the whole keeper corpus —
    near-dup candidates are a tiny fraction of any real corpus, so the
    re-shingling pass shrinks from |corpus| to |candidates| texts.
    ``pairs`` is checkpointed ONCE here and flagged as materialized to
    ``jaccard_on_pairs``, so the id cut and the probe both read the one
    materialized candidate set."""
    sig = _kept_signature(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(sig, "doc_id", k=_K, bands=_BANDS_N).localCheckpoint()
    cand_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = _kept_docs(spark, sf_dir).join(cand_ids, "doc_id", "left_semi")
    sh = D.word_shingles(cand_docs, "doc_id", "text", n=3)
    return D.jaccard_on_pairs(pairs, sh, "doc_id", pairs_materialized=True)


@query(
    "minhash_jaccard_estimate",
    oracle=f"""
    WITH sig AS ({_SIG_KEPT}), pairs AS ({_PAIRS})
    SELECT p.id_a AS id_a, p.id_b AS id_b,
           ROUND(({' + '.join(f'CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END' for i in range(_K))})
                 / {float(_K)}, 6) AS jaccard_est
    FROM pairs p
    JOIN sig a ON a.doc_id = p.id_a
    JOIN sig b ON b.doc_id = p.id_b
    """,
    gate=False,  # family rows: lsh_candidate_pairs + ngram_jaccard_pairs
)
def minhash_jaccard_estimate(spark, sf_dir):
    """Sketch-tier Jaccard: slot-agreement fraction of the MinHash
    signatures (unbiased estimator of true Jaccard).  The scale path —
    verification reads only |keepers|×k signature rows, never the
    shingle corpus; exact ``ngram_jaccard_pairs`` is its refinement
    tier."""
    sig = _kept_signature(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(sig, "doc_id", k=_K, bands=_BANDS_N)
    return D.minhash_jaccard_estimate(pairs, sig, "doc_id", k=_K)


# ---------------------------------------------------------------------------
# SimHash (programmatically generated 64-bit vote SQL)
# ---------------------------------------------------------------------------


def _simhash_oracle(src: str = "SELECT * FROM documents") -> str:
    digits = ", ".join(
        f"strpos('0123456789abcdef', substr(h, {c + 1}, 1)) - 1 AS d{c}"
        for c in range(16)
    )
    votes = ", ".join(
        f"SUM(CASE WHEN (d{c} >> {3 - b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{c}_{b}"
        for c in range(16)
        for b in range(4)
    )
    chars = " || ".join(
        "substr('0123456789abcdef', 1 + "
        + " + ".join(
            f"(CASE WHEN v{c}_{b} > 0 THEN {1 << (3 - b)} ELSE 0 END)"
            for b in range(4)
        )
        + ", 1)"
        for c in range(16)
    )
    return rf"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM ({src})),
    hashes AS (SELECT doc_id, md5(w) AS h FROM words),
    digits AS (SELECT doc_id, {digits} FROM hashes),
    votes AS (SELECT doc_id, {votes} FROM digits GROUP BY doc_id)
    SELECT doc_id, {chars} AS simhash FROM votes
    """


@query("simhash_signatures", oracle=_simhash_oracle(), gate=False)
# ^ demoted in the round-8 rotation (signature-artifact pair with
# minhash_signatures); pytest parity keeps the full hash oracle
def simhash_signatures(spark, sf_dir):
    """64-bit SimHash per doc (bit-majority of word md5 bits)."""
    return D.simhash_signature(table(spark, sf_dir, "documents"), "doc_id", "text")


def _simhash_pairs_oracle(max_hamming: int = 8) -> str:
    chunk_bits = " + ".join(
        f"bit_count(xor(('0x' || substr(sa, {c * 4 + 1}, 4))::INT,"
        f" ('0x' || substr(sb, {c * 4 + 1}, 4))::INT))"
        for c in range(4)
    )
    return f"""
    WITH sig AS ({_simhash_oracle(_DOCS_KEPT)}),
    banded AS (
      SELECT doc_id, simhash, b.band AS band,
             substr(simhash, b.band * 4 + 1, 4) AS key
      FROM sig, (SELECT unnest([0,1,2,3]) AS band) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b, CAST({chunk_bits} AS BIGINT) AS hamming FROM cand)
    WHERE hamming <= {max_hamming}
    """


@query("simhash_neardup_pairs", oracle=_simhash_pairs_oracle(), gate=False)
def simhash_neardup_pairs(spark, sf_dir):
    """Bitwise near-dup tier: banded SimHash candidates (docs sharing a
    16-bit signature chunk — pigeonhole covers Hamming ≤ 3 exactly,
    further only probabilistically) verified by exact XOR-popcount
    Hamming distance.  Complements the shingle-Jaccard chain: SimHash
    catches word-substitution edits that shift many shingles at once.
    Exact-dup keepers only (same O(k²) guard as LSH)."""
    sig = D.simhash_signature(_kept_docs(spark, sf_dir), "doc_id", "text")
    return D.simhash_hamming_pairs(sig, "doc_id", max_hamming=8, bands=4)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "token_stats",
    oracle=rf"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{X.BPE_PATTERN}')) AS n_bpe_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def token_stats(spark, sf_dir):
    return X.token_stats(table(spark, sf_dir, "documents"), "doc_id", "text")


_QUALITY_SQL = rf"""
    WITH m AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '\S+')) AS n_words,
             len(regexp_extract_all(text, '[a-zA-Z]')) AS n_alpha,
             len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct,
             len(regexp_extract_all(text, '{X.STOPWORDS_PATTERN}')) AS n_stop,
             length(text) AS n_chars
      FROM documents)
    SELECT doc_id, n_words,
           ROUND(n_alpha / n_words, 6) AS avg_word_len,
           ROUND(n_punct / n_chars, 6) AS punct_ratio,
           ROUND(n_stop / n_words, 6) AS stopword_ratio,
           ROUND(LEAST(n_words / 200.0, 1.0) * 0.4
                 + ROUND(n_stop / n_words, 6) * 0.4
                 + (1 - ROUND(n_punct / n_chars, 6)) * 0.2, 6) AS quality_score
    FROM m
    """


@query("quality_scores", oracle=_QUALITY_SQL)
def quality_scores(spark, sf_dir):
    return X.quality_scores(table(spark, sf_dir, "documents"), "doc_id", "text")


def _langid_oracle() -> str:
    score = {
        lang: f"len(regexp_extract_all(lower(text), '{pat}'))"
        for lang, pat in X.LANG_MARKERS.items()
    }
    langs = sorted(X.LANG_MARKERS)  # de, en, es, fr
    cases = []
    for i, lang in enumerate(langs):
        rest = [f"s_{l2}" for l2 in langs[i + 1 :]] + ["1"]
        cases.append(f"WHEN s_{lang} >= GREATEST({', '.join(rest)}) THEN '{lang}'")
    case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {', '.join(f"{score[lang]} AS s_{lang}" for lang in langs)}
      FROM documents)
    SELECT doc_id,
           {', '.join(f"s_{lang} AS score_{lang}" for lang in langs)},
           {case} AS pred_lang,
           lang AS actual_lang,
           ({case}) = lang AS is_match
    FROM scored
    """


@query("lang_id", oracle=_langid_oracle())
def lang_id(spark, sf_dir):
    """Marker-stopword language-ID heuristic (argmax, alphabetical
    tie-break, 'und' when nothing fires)."""
    return X.lang_id(table(spark, sf_dir, "documents"), "doc_id", "text", "lang")


# ---------------------------------------------------------------------------
# embeddings: norms, brute-force cosine top-k, IVF ANN
# ---------------------------------------------------------------------------

_VECS = """SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings"""


@query(
    "embedding_norms",
    # round-10 gate rotation: cosine_topk subsumes the norm expression;
    # this row stays pytest-oracle-verified
    gate=False,
    oracle=f"""
    SELECT vec_id, label, len(e) AS dim, ROUND(nrm, 6) AS norm
    FROM ({_VECS})
    """,
)
def embedding_norms(spark, sf_dir):
    """Vector plumbing: dims + L2 norm via zip_with/aggregate fold."""
    e = table(spark, sf_dir, "embeddings")
    v = S.as_double(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(S.l2_norm(v), 6).alias("norm"),
    )


@query(
    "cosine_topk",
    oracle=f"""
    WITH v AS ({_VECS}), q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS score
      FROM q JOIN v c ON c.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
)
def cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-3 for query vectors vec_id < 5."""
    e = table(spark, sf_dir, "embeddings")
    out = S.cosine_topk(e, e.filter(F.col("vec_id") < 5), k=3)
    return out.select("query_id", "neighbor_id", "score", "rk")


# no SQL oracle (rows-only): centroid assignment depends on float-mean
# accumulation order, which no cross-engine SQL reproduces.  gate=False —
# the gated ANN row is ``ann_lsh_topk`` below, whose bucketing is exact
# integer math and therefore hash-verifiable.
@query("ann_ivf_topk", gate=False)
def ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN (label = coarse cluster): probe nearest centroid
    only.  Approximate by design → no SQL oracle; correctness baseline is
    ``cosine_topk``."""
    e = table(spark, sf_dir, "embeddings")
    out = S.ivf_topk(e, e.filter(F.col("vec_id") < 5), k=3)
    return out.select("query_id", "neighbor_id", "score", "rk")


_DIM = 64
_N_PLANES = 8


def _plane_bits_sql(seed: int = 0) -> str:
    """The hyperplane signature bits as exact-integer SQL — shared by
    every LSH-bucketed embedding oracle so Spark and DuckDB can never
    disagree on a bucket."""
    planes = S.hyperplane_signs(_DIM, _N_PLANES, seed)
    return " || ".join(
        "(CASE WHEN list_dot_product(q, ["
        + ", ".join(str(s) for s in signs)
        + "]::BIGINT[]) >= 0 THEN '1' ELSE '0' END)"
        for signs in planes
    )


def _ann_lsh_oracle() -> str:
    bits = _plane_bits_sql()
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000) AS BIGINT)) AS q
      FROM embeddings),
    s AS (SELECT vec_id, e, nrm, {bits} AS bucket FROM v),
    qs AS (SELECT * FROM s WHERE vec_id < 5),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(qs.e, c.e) / (qs.nrm * c.nrm), 6) AS score
      FROM qs JOIN s c ON c.bucket = qs.bucket AND c.vec_id <> qs.vec_id)
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM scored)
    WHERE rk <= 3
    """


@query("ann_lsh_topk", oracle=_ann_lsh_oracle())
def ann_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN with a FULL hash oracle: bucket bits are
    computed in exact integer arithmetic (quantized vectors × md5-derived
    ±1 hyperplanes), so unlike IVF the approximate path is reproducible
    bit-for-bit by the SQL oracle.  Candidates share the query's 8-bit
    signature; exact cosine re-ranks within the bucket
    (operators/similarity.py:lsh_topk)."""
    e = table(spark, sf_dir, "embeddings")
    out = S.lsh_topk(
        e, e.filter(F.col("vec_id") < 5), dim=_DIM, n_planes=_N_PLANES, k=3
    )
    return out.select("query_id", "neighbor_id", "score", "rk")


# ---------------------------------------------------------------------------
# multimodal plumbing (Arrow-batched mapInPandas with a deterministic
# fake decode — see operators/multimodal.py)
# ---------------------------------------------------------------------------

_HEXVAL = "(strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1)"


def _byte_expr(i: int) -> str:
    hi = _HEXVAL.format(p=2 * i + 1)
    lo = _HEXVAL.format(p=2 * i + 2)
    return f"ROUND(({hi} * 16 + {lo}) / 255.0, 6)"


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum,
           {', '.join(f'{_byte_expr(i)} AS f{i}' for i in range(4))}
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary-column pipeline: blob + metadata -> mapInPandas feature
    extraction (deterministic fake decode over the md5 digest).

    The feature vector is unpacked into scalar columns f0..f3 for the
    gate (the driver canonicalizer can't hash list cells); the operator
    itself keeps the array<double> contract."""
    docs = table(spark, sf_dir, "documents")
    blobs = attach_binary(docs, "text", "doc_id")
    feats = extract_features(blobs)
    return feats.select(
        "id", "byte_len", "checksum",
        *[feats["feature"][i].alias(f"f{i}") for i in range(4)],
    )


# ---------------------------------------------------------------------------
# duplicate clusters — connected components over the LSH candidate graph
# ---------------------------------------------------------------------------


# the recursive-reachability cluster CTE chain, shared by dedup_clusters
# and the quality-aware keeper query so "cluster" can never drift
_CLUSTERS_CTES = f"""pairs AS ({_PAIRS}),
    exact_edges AS (
      SELECT k.id_a, d.doc_id AS id_b
      FROM (SELECT md5({_NORM_SQL}) AS fp, MIN(doc_id) AS id_a
            FROM documents GROUP BY 1) k
      JOIN (SELECT md5({_NORM_SQL}) AS fp, doc_id FROM documents) d USING (fp)
      WHERE d.doc_id <> k.id_a
    ),
    all_pairs AS (SELECT * FROM pairs UNION SELECT * FROM exact_edges),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM all_pairs
      UNION SELECT id_b, id_a FROM all_pairs
    ),
    reach(src, dst) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    clusters AS (SELECT src AS node, MIN(dst) AS cluster_id FROM reach GROUP BY 1)"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_CLUSTERS_CTES}
    SELECT node, cluster_id FROM clusters
    """,
)
def dedup_clusters(spark, sf_dir):
    """Dup clusters: keeper-only LSH candidate pairs UNION the O(k)
    exact-dup star edges → connected components (iterative min-label
    propagation; operators/dedup.py).  The pre-guard keeps the pair
    graph quadratic-free while the star edges keep every document —
    including exact-dup members — in its cluster.  The oracle is an
    exact recursive-CTE reachability query — the iterative Spark
    algorithm must converge to the same fixpoint."""
    docs = table(spark, sf_dir, "documents")
    sig = _kept_signature(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(sig, "doc_id", k=_K, bands=_BANDS_N)
    edges = pairs.unionByName(D.exact_dup_edges(docs, "doc_id", "text")).distinct()
    return D.connected_components(edges)


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents),
    w2 AS (SELECT * FROM words WHERE term <> ''),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w2 GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w2 GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM w2),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln((n.n_docs + 1) / (dfq.df + 1.0)), 6) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
    gate=False,  # text-agg family: tokenize_docs/dsir_importance_weights carry the gate
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (smoothed idf, deterministic
    term tie-break)."""
    return X.tfidf_top_terms(table(spark, sf_dir, "documents"), "doc_id", "text", k=3)


# ---------------------------------------------------------------------------
# skew-salted aggregation — same result as the plain GROUP BY, but the
# hot 5-key aggregation fans across 32 sub-keys first
# ---------------------------------------------------------------------------


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total,
           ROUND(MAX(value), 6) AS max_value
    FROM events GROUP BY 1
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation over the 5-value event_type key
    (operators/skew.py) — identical to the plain GROUP BY, with the
    parallelism of 32×5 partial groups."""
    from ..operators.skew import salted_aggregate

    e = table(spark, sf_dir, "events")
    out = salted_aggregate(
        e,
        keys=["event_type"],
        salt_from=["event_id"],
        aggs={
            "n": ("sum", F.count("*")),
            "total_raw": ("sum", F.sum("value")),
            "max_value_raw": ("max", F.max("value")),
        },
        n_salts=32,
    )
    return out.select(
        "event_type",
        F.col("n"),
        F.round("total_raw", 2).alias("total"),
        F.round("max_value_raw", 6).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# cross-modal near-dup verification: text LSH candidates scored by
# embedding cosine (documents.doc_id ≡ embeddings.vec_id)
# ---------------------------------------------------------------------------


@query(
    "cross_modal_neardup",
    oracle=f"""
    WITH pairs AS ({_PAIRS}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
          FROM embeddings)
    SELECT p.id_a, p.id_b,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS emb_cosine
    FROM pairs p
    JOIN v a ON a.vec_id = p.id_a
    JOIN v b ON b.vec_id = p.id_b
    """,
    gate=False,  # banding family: lsh_candidate_pairs carries the gate
)
def cross_modal_neardup(spark, sf_dir):
    """Cross-modal dedup verification: text-shingle LSH candidates
    re-scored by embedding cosine — two equi-joins against the vector
    table (inverted probe), never an all-pairs vector scan."""
    from ..operators.similarity import as_double, l2_norm

    sig = _kept_signature(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(sig, "doc_id", k=_K, bands=_BANDS_N)
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        as_double(F.col("embedding")).alias("e"),
        l2_norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.try_divide(
                    S.dot(F.col("ea"), F.col("eb")),
                    F.col("na") * F.col("nb"),
                ),
                6,
            ).alias("emb_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# multimodal frame sampling — 1→N fan-out inside one Arrow pass
# ---------------------------------------------------------------------------

_N_FRAMES = 3

_FRAME_HEX = "(strpos('0123456789abcdef', substr(md5(frame), {p}, 1)) - 1)"


def _frame_byte_expr(i: int) -> str:
    hi = _FRAME_HEX.format(p=2 * i + 1)
    lo = _FRAME_HEX.format(p=2 * i + 2)
    return f"ROUND(({hi} * 16 + {lo}) / 255.0, 6)"


def _frames_oracle() -> str:
    # documents are pure ASCII (checked in testdata), so char slices ==
    # byte slices and substr reproduces the Python bytes[i*step:(i+1)*step]
    return f"""
    WITH framed AS (
      SELECT doc_id AS id, f.i AS frame_idx,
             substr(text, f.i * GREATEST(length(text) // {_N_FRAMES}, 1) + 1,
                    GREATEST(length(text) // {_N_FRAMES}, 1)) AS frame
      FROM documents,
           (SELECT unnest(range({_N_FRAMES})) AS i) f)
    SELECT id, CAST(frame_idx AS INT) AS frame_idx,
           md5(frame) AS frame_checksum,
           {', '.join(f'{_frame_byte_expr(i)} AS f{i}' for i in range(4))}
    FROM framed
    """


@query("multimodal_frame_sample", oracle=_frames_oracle(), gate=False)  # family row: multimodal_features
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over binary blobs: one Arrow ``mapInPandas`` pass
    fanning each blob into 3 frame rows (checksum + stub feature) —
    the video-decode plumbing shape with a deterministic fake decode.
    Feature vector unpacked to f0..f3 for the gate (no list cells)."""
    from ..operators.multimodal import sample_frames

    docs = table(spark, sf_dir, "documents")
    blobs = attach_binary(docs, "text", "doc_id")
    frames = sample_frames(blobs, n_frames=_N_FRAMES)
    return frames.select(
        "id", "frame_idx", "frame_checksum",
        *[frames["frame_feature"][i].alias(f"f{i}") for i in range(4)],
    )


# ---------------------------------------------------------------------------
# edit-distance fuzzy dedup (blocked levenshtein)
# ---------------------------------------------------------------------------


@query(
    "fuzzy_name_pairs",
    oracle="""
    WITH c AS (SELECT c_custkey, c_nationkey, c_name FROM customer)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey
     AND substr(a.c_name, 1, 10) = substr(b.c_name, 1, 10)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 3
    """,
    gate=False,  # dedup family: dedup_exact/lsh/clusters carry the gate
)
def fuzzy_name_pairs(spark, sf_dir):
    """Edit-distance near-dup with blocking: candidates share a nation
    and a 10-char name prefix (equi-join — never all-pairs), then exact
    levenshtein verifies.  The blocked-similarity template for short
    strings, complementing shingle-LSH for documents."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_name")
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_a"),
        F.substring("c_name", 1, 10).alias("blk"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_b"),
        F.substring("c_name", 1, 10).alias("blk"),
    )
    return (
        a.join(b, ["nk", "blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("id_a", "id_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# curation funnel — the training-data pipeline stages composed end-to-end
# ---------------------------------------------------------------------------

_FUNNEL_QUALITY_MIN = 0.3  # ~ corpus median at the gate SFs


def _funnel_oracle() -> str:
    return f"""
    WITH lang AS ({_langid_oracle()}),
    qual AS ({_QUALITY_SQL}),
    d1 AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN lang l USING (doc_id) WHERE l.pred_lang = 'en'),
    d2 AS (
      SELECT d1.* FROM d1
      JOIN qual q USING (doc_id)
      WHERE q.quality_score >= {_FUNNEL_QUALITY_MIN}),
    k AS (
      SELECT MIN(doc_id) AS doc_id
      FROM (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM d2) GROUP BY fp),
    d3 AS (SELECT * FROM d2 WHERE doc_id IN (SELECT doc_id FROM k)),
    p AS ({_pairs_sql("SELECT doc_id, text FROM d3")}),
    d4 AS (SELECT * FROM d3 WHERE doc_id NOT IN (SELECT id_b FROM p))
    SELECT 0 AS stage_idx, 'total' AS stage,
           (SELECT COUNT(*) FROM documents) AS n_docs
    UNION ALL SELECT 1, 'lang_en', (SELECT COUNT(*) FROM d1)
    UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM d2)
    UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM d3)
    UNION ALL SELECT 4, 'near_dedup', (SELECT COUNT(*) FROM d4)
    """


@query("curation_funnel", oracle=_funnel_oracle())  # gated since round 4
# (slot freed by weekly_steps): the funnel is the composed-pipeline
# evidence — lang-ID, quality, exact dedup, and LSH near-dup chained
# with survivor-only semantics — which the gate prefers over a
# redundant time-key variant of an already-gated aggregate.
def curation_funnel(spark, sf_dir):
    """The curation pipeline a 100 TB pretraining corpus runs, composed
    from this repo's operators, reporting per-stage retention:

      total → language-ID (marker heuristic = 'en') → quality threshold
      → exact dedup (keepers within survivors) → near-dup removal (drop
      LSH-pair losers, pairs computed WITHIN the surviving corpus — a
      pair whose other member was already filtered out must not delete
      the last retained copy of that content)

    Every stage is a narrow map or a bounded-key join/agg over the prior
    stage — the funnel inherits each operator's scale shape, and the
    whole thing is one lazy plan (the per-stage counts are 5 aggregates
    unioned, executed as one action)."""
    return build_curation_funnel(table(spark, sf_dir, "documents"))


def funnel_frontiers(docs):
    """Checkpointed stage frontiers d0..d4 over an arbitrary documents
    frame (doc_id, text) — the shared spine of ``curation_funnel`` and
    ``curation_funnel_full``.

    Each frontier is ``localCheckpoint``ed (the ``_kept_signature``
    pattern): the unioned stage counts would otherwise each embed the
    full upstream plan and re-execute the lang/quality joins up to 4×.
    With the checkpoints every stage's incremental work runs exactly
    once and downstream consumers (counts, the decontamination/budget
    tiers of the full funnel) read the materialized frontier — the
    audited exchange count drops from 25 to 12.  ``near_dedup`` is a
    lazy checkpoint: the plain funnel only counts it once, while the
    full funnel's reuse (shingles + semi-join) triggers materialization
    on first action."""
    lang = X.lang_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    # the ONE quality scan of the whole pipeline: checkpointed so both
    # the quality frontier here and the full funnel's token-budget tier
    # read the same materialized scores — the budget tier recomputing
    # quality_scores over the corpus was a whole redundant scan per run
    qual = (
        X.quality_scores(docs, "doc_id", "text")
        .select("doc_id", "n_words", "quality_score")
        .localCheckpoint()
    )
    d1 = (
        docs.join(lang, "doc_id")
        .filter(F.col("pred_lang") == "en")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    d2 = (
        d1.join(qual.select("doc_id", "quality_score"), "doc_id")
        .filter(F.col("quality_score") >= _FUNNEL_QUALITY_MIN)
        .select("doc_id", "text")
        .localCheckpoint()
    )
    keepers = D.exact_dedup_groups(d2, "doc_id", "text").select(
        F.col("keeper_id").alias("doc_id")
    )
    d3 = d2.join(keepers, "doc_id", "left_semi").localCheckpoint()
    sh3 = D.word_shingles(d3, "doc_id", "text", n=3)
    sig3 = D.minhash_signature(sh3, "doc_id", k=_K)
    losers = D.lsh_candidate_pairs(sig3, "doc_id", k=_K, bands=_BANDS_N).select(
        F.col("id_b").alias("doc_id")
    )
    d4 = d3.join(losers, "doc_id", "left_anti").localCheckpoint(eager=False)
    return {
        "total": docs,
        "lang_en": d1,
        "quality": d2,
        "exact_dedup": d3,
        "near_dedup": d4,
        # not a stage: the shared quality frame, for downstream tiers
        "_quality_scores": qual,
    }


def _stage_count(idx, name, df):
    return df.agg(
        F.lit(idx).alias("stage_idx"),
        F.lit(name).alias("stage"),
        F.count("*").alias("n_docs"),
    )


def build_curation_funnel(docs, frontiers=None):
    """Per-stage retention counts over ``funnel_frontiers`` (split out so
    cross-stage semantics are unit-testable on crafted corpora, not only
    oracle-checkable on the fixed testdata)."""
    fr = frontiers if frontiers is not None else funnel_frontiers(docs)
    out = None
    for idx, name in enumerate(
        ("total", "lang_en", "quality", "exact_dedup", "near_dedup")
    ):
        st = _stage_count(idx, name, fr[name])
        out = st if out is None else out.unionByName(st)
    return out


# ---------------------------------------------------------------------------
# training-batch assembly: sequence packing + dataset mixing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512
_PACK_SHARDS = 64
_MIX_RATES = {"en": 80, "de": 50, "fr": 50, "es": 50}  # zh & others: 10


@query(
    "sequence_packing",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '\S+')) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {_PACK_SHARDS} AS shard
      FROM documents)
    SELECT doc_id, n_tokens, shard,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {_PACK_BUDGET}) AS BIGINT) AS bin_idx
    FROM t
    """,
    gate=False,
)
def sequence_packing(spark, sf_dir):
    """Pack documents into fixed-token-budget training sequences, sharded by
    a content hash so no window ever runs globally
    (operators/packing.py:pack_sequences)."""
    docs = table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", X._count(r"\S+", F.col("text")).alias("n_tok")
    )
    out = P.pack_sequences(
        with_tokens, "doc_id", "n_tok", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )
    return out.select("doc_id", "n_tokens", "shard", "bin_idx")


@query(
    "dataset_mixing_sample",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket,
             CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_RATES.items()))}
                  ELSE 10 END AS rate
      FROM documents)
    SELECT lang, COUNT(*) AS n_sampled
    FROM s WHERE bucket < rate
    GROUP BY lang
    """,
    gate=False,
)
def dataset_mixing_sample(spark, sf_dir):
    """Deterministic stratified sampling at per-language mixing rates —
    the corpus-mixing step of a pretraining pipeline; hash-mod keeps the
    SAME rows on any engine/cluster (operators/packing.py)."""
    docs = table(spark, sf_dir, "documents")
    kept = P.stratified_sample(docs, "doc_id", "lang", _MIX_RATES, default_pct=10)
    return kept.groupBy("lang").agg(F.count("*").alias("n_sampled"))


@query(
    "repetition_scores",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i+1])) AS g
      FROM w WHERE len(ws) >= 2),
    per_gram AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           MAX(c) AS top_gram_count,
           ROUND(MAX(c) / SUM(c), 6) AS top_gram_frac,
           ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / SUM(c), 6)
             AS dup_gram_frac
    FROM per_gram GROUP BY doc_id
    """,
    gate=False,
)
def repetition_scores(spark, sf_dir):
    """Gopher-style repetition signals: top-bigram fraction + repeated-
    bigram coverage per document (operators/text.py:repetition_scores)."""
    return X.repetition_scores(table(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# decontamination / budget curation / PII  (round 4)
# ---------------------------------------------------------------------------


@query(
    "contamination_check",
    oracle=f"""
    WITH cs AS ({_shingles_sql("SELECT * FROM documents WHERE source <> 'src0'")}),
         bs AS ({_shingles_sql("SELECT * FROM documents WHERE source = 'src0'")})
    SELECT cs.doc_id AS doc_id,
           COUNT(DISTINCT cs.sh) AS n_hit_shingles,
           COUNT(DISTINCT bs.doc_id) AS n_bench_docs
    FROM cs JOIN bs ON bs.sh = cs.sh
    GROUP BY 1
    """,
    gate=False,
)
def contamination_check(spark, sf_dir):
    """Benchmark decontamination: training docs (source != src0) that
    share a word 3-gram with the benchmark set (source = src0), with
    hit evidence.  The benchmark shingle set broadcasts — at 100 TB the
    corpus never shuffles on the n-gram key
    (operators/dedup.py:benchmark_contamination)."""
    docs = table(spark, sf_dir, "documents")
    bench_sh = D.word_shingles(
        docs.filter(F.col("source") == "src0"), "doc_id", "text", n=3
    )
    corpus_sh = D.word_shingles(
        docs.filter(F.col("source") != "src0"), "doc_id", "text", n=3
    )
    return D.benchmark_contamination(corpus_sh, bench_sh, "doc_id")


_BUDGET = 25_000  # words — cuts mid-corpus at sf0.01, everything at tiny SFs


@query(
    "token_budget_cut",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL}),
    c AS (
      SELECT doc_id, n_words AS n_tokens, quality_score AS score,
             CAST(SUM(n_words) OVER (ORDER BY quality_score DESC, doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM q
      WHERE quality_score IS NOT NULL AND n_words IS NOT NULL)
    SELECT doc_id, n_tokens, score, cum_tokens
    FROM c WHERE cum_tokens <= {_BUDGET}
    """,
    gate=False,
)
def token_budget_cut(spark, sf_dir):
    """Curate down to a global token budget: best-quality-first running
    total, cut at 25k words.  The oracle is a single global window;
    the Spark plan is the two-phase histogram-threshold shape — per-
    score-bucket hash-agg, bounded driver boundary scan, per-bucket
    windows — so no task ever sees a global ORDER BY
    (operators/packing.py:token_budget_cut)."""
    docs = table(spark, sf_dir, "documents")
    scored = X.quality_scores(docs, "doc_id", "text").select(
        "doc_id", "n_words", "quality_score"
    )
    return P.token_budget_cut(
        scored, "doc_id", "n_words", "quality_score", budget=_BUDGET
    )


def _pii_oracle() -> str:
    counts = ", ".join(
        f"len(regexp_extract_all(profile, '{pat}')) AS n_{name}"
        for name, (pat, _) in X.PII_PATTERNS.items()
    )
    red = "profile"
    for pat, token in X.PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
    SELECT c_custkey, {counts}, {red} AS redacted
    FROM (SELECT c_custkey, c_name || ' ' || c_mktsegment AS profile
          FROM customer)
    """


@query("pii_redact", oracle=_pii_oracle(), gate=False)
def pii_redact(spark, sf_dir):
    """PII census + redaction over synthesized customer profile strings
    (email/phone/id-tag/digit-run patterns; counts measured pre-
    redaction, replacements applied in declaration order).  Narrow
    codegen map — no shuffle (operators/text.py:pii_scan)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat_ws(" ", F.col("c_name"), F.col("c_mktsegment")).alias("profile"),
    )
    return X.pii_scan(cust, "c_custkey", "profile")


_SUB_N = 10  # long-gram order for substring overlap (tests: ~54-word docs)


def _long_grams_sql(src: str, n: int) -> str:
    return rf"""SELECT DISTINCT doc_id,
       unnest(list_transform(range(1, len(ws) - {n - 2}),
              i -> array_to_string(list_slice(ws, i, i + {n - 1}), ' '))) AS sh
    FROM ({_words_sql(src)}) WHERE len(ws) >= {n}"""


@query(
    "substring_dup_pairs",
    oracle=f"""
    WITH g AS ({_long_grams_sql(_DOCS_KEPT, _SUB_N)}),
    band AS (
      SELECT sh FROM g GROUP BY sh HAVING COUNT(*) BETWEEN 2 AND 50)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_ngrams
    FROM g a JOIN band USING (sh) JOIN g b
      ON b.sh = a.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    gate=False,
)
def substring_dup_pairs(spark, sf_dir):
    """Exact long-substring overlap (10-word grams, df band 2..50):
    the partial-copy tier whole-document Jaccard misses.  Exact-dup
    keepers feed it — same O(k) family guard as the LSH chain
    (operators/dedup.py:substring_dup_pairs)."""
    grams = D.word_shingles(_kept_docs(spark, sf_dir), "doc_id", "text", n=_SUB_N)
    return D.substring_dup_pairs(grams, "doc_id", min_df=2, max_df=50)


# ---------------------------------------------------------------------------
# full curation funnel: + decontamination + token budget (round 4)
# ---------------------------------------------------------------------------

_FUNNEL_BUDGET = 5_000  # words — bites after the quality/dedup stages


def _funnel_full_oracle() -> str:
    base = _funnel_oracle().rsplit("SELECT 0 AS stage_idx", 1)[0].rstrip() + ","
    bsh = _shingles_sql("SELECT * FROM documents WHERE source = 'src0'")
    csh = _shingles_sql(
        "SELECT d4.doc_id, d4.text FROM d4 "
        "JOIN documents USING (doc_id) WHERE source <> 'src0'"
    )
    return f"""{base}
    bsh AS ({bsh}),
    csh AS ({csh}),
    d5 AS (
      SELECT d4.* FROM d4 JOIN documents USING (doc_id)
      WHERE source <> 'src0'
        AND doc_id NOT IN (SELECT DISTINCT c.doc_id
                           FROM csh c JOIN bsh b ON b.sh = c.sh)),
    qual5 AS (
      SELECT q.doc_id, q.n_words, q.quality_score,
             SUM(q.n_words) OVER (ORDER BY q.quality_score DESC, q.doc_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
      FROM qual q JOIN d5 USING (doc_id)
      WHERE q.quality_score IS NOT NULL AND q.n_words IS NOT NULL),
    d6 AS (SELECT doc_id FROM qual5 WHERE cum <= {_FUNNEL_BUDGET})
    SELECT 0 AS stage_idx, 'total' AS stage,
           (SELECT COUNT(*) FROM documents) AS n_docs
    UNION ALL SELECT 1, 'lang_en', (SELECT COUNT(*) FROM d1)
    UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM d2)
    UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM d3)
    UNION ALL SELECT 4, 'near_dedup', (SELECT COUNT(*) FROM d4)
    UNION ALL SELECT 5, 'decontaminated', (SELECT COUNT(*) FROM d5)
    UNION ALL SELECT 6, 'token_budget', (SELECT COUNT(*) FROM d6)
    """


@query("curation_funnel_full", oracle=_funnel_full_oracle(), gate=False)
def curation_funnel_full(spark, sf_dir):
    """The complete corpus-curation pipeline, every tier composed from
    this repo's operators with per-stage retention:

      total → lang-ID → quality → exact dedup → LSH near-dedup →
      benchmark decontamination (src0 = the eval set: its docs leave the
      training corpus, and any doc sharing a 3-gram with it is dropped
      as leakage) → token-budget cut (best-quality-first running total,
      two-phase histogram — no global window).

    Stages 0-4 are the SAME checkpointed ``funnel_frontiers`` the plain
    funnel counts — shared, not recomputed; the two new tiers inherit
    the scale shapes of their operators — broadcast benchmark probe,
    bounded driver histogram scan."""
    docs = table(spark, sf_dir, "documents")
    fr = funnel_frontiers(docs)
    funnel = build_curation_funnel(docs, frontiers=fr)
    d4 = fr["near_dedup"]
    # the checkpointed quality frame funnel_frontiers already built —
    # NOT a second quality_scores pass over the corpus
    qual = fr["_quality_scores"]

    src = docs.select("doc_id", "source")
    bench_sh = D.word_shingles(
        docs.filter(F.col("source") == "src0"), "doc_id", "text", n=3
    )
    train4 = d4.join(src, "doc_id").filter(F.col("source") != "src0")
    contaminated = D.benchmark_contamination(
        D.word_shingles(train4, "doc_id", "text", n=3), bench_sh, "doc_id"
    ).select("doc_id")
    d5 = (
        train4.join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    d6 = P.token_budget_cut(
        d5.join(qual, "doc_id"),
        "doc_id",
        "n_words",
        "quality_score",
        budget=_FUNNEL_BUDGET,
    )
    out = funnel
    out = out.unionByName(_stage_count(5, "decontaminated", d5))
    out = out.unionByName(_stage_count(6, "token_budget", d6))
    return out


# ---------------------------------------------------------------------------
# paragraph-level dedup / shuffle-shard / mixing weights / stop-gram census
# (round 5)
# ---------------------------------------------------------------------------

_CHUNK_WORDS = 10


@query(
    "chunk_dedup_stats",
    oracle=rf"""
    WITH w AS ({_words_sql("SELECT * FROM documents WHERE len(trim(text)) > 0")}),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(ws) / {_CHUNK_WORDS}.0) AS BIGINT)),
               i -> array_to_string(
                      list_slice(ws, i * {_CHUNK_WORDS} + 1,
                                 i * {_CHUNK_WORDS} + {_CHUNK_WORDS}), ' ')))
               AS chunk
      FROM w),
    cdf AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS doc_freq
      FROM chunks GROUP BY 1)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN doc_freq >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           ROUND(SUM(CASE WHEN doc_freq >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS dup_chunk_frac
    FROM chunks JOIN cdf USING (chunk)
    GROUP BY doc_id
    """,
    gate=False,
)
def chunk_dedup_stats(spark, sf_dir):
    """Paragraph-level (fixed 10-word-chunk) cross-document duplication
    census — the measurement step of C4/RefinedWeb-style line dedup,
    approximated by deterministic fixed-width segmentation because this
    corpus has no newline structure.  One hash-agg on the chunk key +
    one equi-join back; no pair fan-out at any df
    (operators/dedup.py:doc_chunks, chunk_dedup_stats)."""
    docs = table(spark, sf_dir, "documents")
    chunks = D.doc_chunks(docs, "doc_id", "text", chunk_words=_CHUNK_WORDS)
    return D.chunk_dedup_stats(chunks, "doc_id", min_doc_freq=2)


_SHUFFLE_SHARDS = 8


@query(
    "shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS hv
      FROM documents)
    SELECT doc_id, hv % {_SHUFFLE_SHARDS} AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hv % {_SHUFFLE_SHARDS}
                                   ORDER BY hv ASC, doc_id ASC) AS INT) AS pos
    FROM h
    """,
    gate=False,
)
def shuffle_shards(spark, sf_dir):
    """Deterministic seeded shuffle + shard assignment for training-data
    writing: content-derived shard and within-shard position, identical
    on any cluster size / engine / re-run.  One shuffle on the shard
    key; windows per shard, never global
    (operators/packing.py:shuffle_shard)."""
    docs = table(spark, sf_dir, "documents")
    return P.shuffle_shard(docs, "doc_id", n_shards=_SHUFFLE_SHARDS, seed=0)


_MIX_SQL = r"""
    WITH agg AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    t AS (SELECT *, n_tokens / SUM(n_tokens) OVER () AS p FROM agg)
    SELECT source, n_docs, n_tokens,
           ROUND(p, 6) AS token_share,
           ROUND(pow(p, 0.5) / SUM(pow(p, 0.5)) OVER (), 6) AS mix_weight
    FROM t
"""


@query("source_mix_weights", oracle=_MIX_SQL, gate=False)
def source_mix_weights(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) source-mixing weights from per-
    source token totals — the corpus-mixing knob computed from the data
    instead of hand-set.  One hash-agg over the corpus; the window runs
    on the source-count-bounded aggregate
    (operators/packing.py:mix_weights)."""
    docs = table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "source", X._count(r"\S+", F.col("text")).alias("n_tok")
    )
    return P.mix_weights(with_tokens, "source", "n_tok", alpha=0.5)


_NGRAM_TOPK = 20


@query(
    "corpus_ngram_topk",
    oracle=rf"""
    WITH w AS ({_words_sql("SELECT * FROM documents")}),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
      FROM w WHERE len(ws) >= 3)
    SELECT gram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM grams GROUP BY gram
    ORDER BY n_occurrences DESC, gram ASC
    LIMIT {_NGRAM_TOPK}
    """,
    gate=False,
)
def corpus_ngram_topk(spark, sf_dir):
    """Corpus-wide top-20 word 3-grams with doc frequencies — the
    boilerplate / stop-gram census that feeds template-removal filters
    and substring_dup_pairs' max_df band.  Hash-agg + TakeOrdered top-k;
    no global sort (operators/text.py:corpus_ngram_topk)."""
    docs = table(spark, sf_dir, "documents")
    return X.corpus_ngram_topk(docs, "doc_id", "text", n=3, k=_NGRAM_TOPK)


@query(
    "auto_mix_sample",
    oracle=rf"""
    WITH w AS ({_MIX_SQL}),
    r AS (SELECT source, CAST(round(mix_weight * 100) AS BIGINT) AS rate FROM w),
    s AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents)
    SELECT s.source, r.rate AS rate_pct, COUNT(*) AS n_sampled
    FROM s JOIN r ON s.source = r.source
    WHERE s.bucket < r.rate
    GROUP BY s.source, r.rate
    """,
    gate=False,
)
def auto_mix_sample(spark, sf_dir):
    """Measure-then-mix: derive per-source sampling rates FROM the data
    (temperature-scaled mixing weights → integer percentages) and apply
    them with the deterministic hash-mod sampler — the closed loop a
    mixing pipeline actually runs, composed from mix_weights +
    stratified_sample.  The weights table is stratum-bounded, so the
    driver-side rate read is a few rows (the watermark-cursor pattern),
    never data-sized (operators/packing.py)."""
    docs = table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "source", X._count(r"\S+", F.col("text")).alias("n_tok")
    )
    weights = P.mix_weights(with_tokens, "source", "n_tok", alpha=0.5).collect()
    rates = {r["source"]: int(round(r["mix_weight"] * 100)) for r in weights}
    kept = P.stratified_sample(docs, "doc_id", "source", rates, default_pct=0)
    rate_col = F.lit(None).cast("long")
    for src, pct in sorted(rates.items()):
        rate_col = F.when(F.col("source") == src, F.lit(pct)).otherwise(rate_col)
    return kept.groupBy("source").agg(
        F.max(rate_col).alias("rate_pct"), F.count("*").alias("n_sampled")
    )


_SEM_SEEDS = (0, 1)


def _sem_keepers_oracle() -> str:
    vecs = """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000) AS BIGINT)) AS q
      FROM embeddings"""
    sigs = ", ".join(
        f"s{seed} AS (SELECT vec_id, e, nrm, {_plane_bits_sql(seed)} AS bucket FROM v)"
        for seed in _SEM_SEEDS
    )
    dropped = " UNION ".join(
        f"""SELECT b.vec_id AS id_b
            FROM s{seed} a JOIN s{seed} b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) > 0.4"""
        for seed in _SEM_SEEDS
    )
    return f"""
    WITH v AS ({vecs}), {sigs},
    p AS ({dropped})
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT id_b FROM p)
    """


@query("semantic_dedup_keepers", oracle=_sem_keepers_oracle(), gate=False)
def semantic_dedup_keepers(spark, sf_dir):
    """SemDeDup-style removal: keep every embedding with no
    above-threshold near-dup of smaller id among the LSH-bucketed
    candidates (greedy min-id, no transitive chaining) — composed on
    the BUCKETED pair path (two OR'd plane families), not the exact
    all-pairs join: the all-pairs keep-list measured 28 s at sf0.1 and
    133 s at sf1 (the O(n²) blow-up in motion); the bucketed compose
    stays equi-join-bounded and is still fully hash-oracled because
    bucketing is exact integer math.  Recall contract = the pair
    operator's; exact verification remains available via
    embedding_near_dup (operators/similarity.py:semantic_dedup_keepers,
    lsh_near_dup_pairs)."""
    from ..operators.similarity import semantic_dedup_keepers as keepers

    pairs = S.lsh_near_dup_pairs(
        table(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        dim=_DIM,
        n_planes=_N_PLANES,
        threshold=0.4,
        plane_seeds=_SEM_SEEDS,
    )
    vectors = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return keepers(vectors, pairs, "vec_id")


def _emb_lsh_pairs_oracle() -> str:
    bits = _plane_bits_sql()
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000) AS BIGINT)) AS q
      FROM embeddings),
    s AS (SELECT vec_id, e, nrm, {bits} AS bucket FROM v)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) > 0.4
    """


@query(
    "unigram_logprob_scores",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents),
    w2 AS (SELECT * FROM words WHERE term <> ''),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w2 GROUP BY 1, 2),
    corpus AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
    tot AS (SELECT SUM(cf) AS total FROM corpus)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
           ROUND(-SUM(tf * ln(cf / total)) / SUM(tf), 6) AS mean_neg_logprob
    FROM tf JOIN corpus USING (term), tot
    GROUP BY doc_id
    """,
    gate=False,
)
def unigram_logprob_scores(spark, sf_dir):
    """Perplexity-style LM filter score: per-doc mean token negative
    log-prob under the corpus's own unigram distribution (the CCNet
    ranking shape; KenLM unavailable in-container).  One explode feeds
    both hash-aggs; corpus total is a 1-row broadcast
    (operators/text.py:unigram_logprob_scores)."""
    return X.unigram_logprob_scores(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "curriculum_shards",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS contiguous, TRUE AS within_sorted
    FROM documents
    """,
    gate=False,  # shard-layout family; shuffle_shards covers the gate path
)
def curriculum_shards(spark, sf_dir):
    """Curriculum shard layout verdict (operators/packing.py:
    curriculum_shard): documents bucketed into 8 quantile shards of
    ``n_chars`` (the difficulty proxy), globally easy-to-hard WITHOUT a
    global sort.  The exact shard sizes depend on approximate quantile
    cuts (engine-specific), so the oracle pins the INVARIANTS instead:
    every row lands somewhere (n_docs), cross-shard ranges are
    contiguous (max of shard k <= min of shard k+1 — guaranteed by
    threshold bucketing, so a regression here is a real bug), and
    within-shard pos order equals the (n_chars, doc_id) sort."""
    from pyspark.sql.window import Window

    from ..operators.packing import curriculum_shard

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cur = curriculum_shard(docs, "doc_id", "n_chars", n_shards=8)
    per = cur.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("n_chars").alias("lo"),
        F.max("n_chars").alias("hi"),
    )
    # n_shards rows at most — the ordered window over them is bounded
    w = Window.orderBy("shard")
    contiguous = per.withColumn("prev_hi", F.lag("hi").over(w)).agg(
        F.sum("n").alias("n_docs"),
        F.bool_and(
            F.col("prev_hi").isNull() | (F.col("prev_hi") <= F.col("lo"))
        ).alias("contiguous"),
    )
    ws = Window.partitionBy("shard").orderBy("pos")
    sorted_ok = cur.withColumn("prev", F.lag("n_chars").over(ws)).agg(
        F.bool_and(
            F.col("prev").isNull() | (F.col("prev") <= F.col("n_chars"))
        ).alias("within_sorted")
    )
    return contiguous.crossJoin(sorted_ok).select(
        "n_docs", "contiguous", "within_sorted"
    )


@query(
    "dsir_importance_weights",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, source = 'src0' AS tgt,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents),
    w2 AS (SELECT * FROM w WHERE term <> ''),
    tf AS (SELECT doc_id, tgt, term, COUNT(*) AS tf FROM w2 GROUP BY 1, 2, 3),
    voc AS (
      SELECT term, SUM(tf) AS cf_all,
             SUM(CASE WHEN tgt THEN tf ELSE 0 END) AS cf_t
      FROM tf GROUP BY 1),
    tot AS (SELECT SUM(cf_all) AS ta, SUM(cf_t) AS tt, COUNT(*) AS v FROM voc)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
           ROUND(SUM(tf * (ln((cf_t + 1) / (tt + v))
                           - ln((cf_all + 1) / (ta + v)))), 6) AS log_iw
    FROM tf JOIN voc USING (term), tot
    GROUP BY doc_id
    """,
    # promoted to the gate in round 8 (rotation, see hist_rollup_quantiles)
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR data-selection weights: log p_target/p_raw per document
    under shared-vocab add-1 unigram models, target = source 'src0'
    (operators/text.py:dsir_importance_weights).  Selection by weight
    composes with token_budget_cut; the weight computation itself is
    one explode + two hash-aggs + a broadcast totals row."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("source") == "src0"
    )
    return X.dsir_importance_weights(docs, "doc_id", "text", "is_target")


@query(
    "chunk_dedup_clean",
    oracle=rf"""
    WITH w AS ({_words_sql("SELECT * FROM documents WHERE len(trim(text)) > 0")}),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(list_slice(ws, i * {_CHUNK_WORDS} + 1,
                                        i * {_CHUNK_WORDS} + {_CHUNK_WORDS}), ' ')
               AS chunk
      FROM (SELECT doc_id, ws,
                   unnest(range(0, CAST(ceil(len(ws) / {_CHUNK_WORDS}.0) AS BIGINT)))
                     AS i
            FROM w)),
    cdf AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS doc_freq, MIN(doc_id) AS kdoc
      FROM chunks GROUP BY 1),
    fidx AS (
      SELECT c.chunk, MIN(c.chunk_idx) AS kidx
      FROM chunks c JOIN cdf ON c.chunk = cdf.chunk AND c.doc_id = cdf.kdoc
      GROUP BY 1),
    surv AS (
      SELECT c.doc_id, c.chunk_idx, c.chunk
      FROM chunks c JOIN cdf ON c.chunk = cdf.chunk
                    JOIN fidx ON c.chunk = fidx.chunk
      WHERE cdf.doc_freq < 2
         OR (c.doc_id = cdf.kdoc AND c.chunk_idx = fidx.kidx))
    SELECT doc_id, COUNT(*) AS n_kept_chunks,
           string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
    FROM surv GROUP BY doc_id
    """,
    gate=False,
)
def chunk_dedup_clean(spark, sf_dir):
    """Paragraph-dedup REMOVAL: rebuild every document keeping a
    cross-document-duplicated chunk only at its corpus-first occurrence
    (RefinedWeb line-dedup rule).  Two hash-aggs on the chunk key as
    keeper filters + per-doc in-array sort reassembly — no window, no
    pair fan-out (operators/dedup.py:chunk_dedup_clean)."""
    docs = table(spark, sf_dir, "documents")
    chunks = D.doc_chunks(docs, "doc_id", "text", chunk_words=_CHUNK_WORDS)
    return D.chunk_dedup_clean(chunks, "doc_id", min_doc_freq=2)


@query(
    "cluster_best_keepers",
    oracle=f"""
    WITH RECURSIVE {_CLUSTERS_CTES},
    q AS ({_QUALITY_SQL}),
    j AS (SELECT c.node AS doc_id, c.cluster_id, q.quality_score
          FROM clusters c JOIN q ON q.doc_id = c.node),
    best AS (SELECT cluster_id, MAX(quality_score) AS bq FROM j GROUP BY 1),
    reps AS (SELECT j.cluster_id, MIN(j.doc_id) AS doc_id
             FROM j JOIN best ON j.cluster_id = best.cluster_id
             WHERE j.quality_score IS NOT DISTINCT FROM best.bq
             GROUP BY j.cluster_id)
    SELECT r.doc_id, r.cluster_id, b.bq AS quality_score
    FROM reps r JOIN best b ON r.cluster_id = b.cluster_id
    UNION ALL
    SELECT q.doc_id, CAST(NULL AS BIGINT) AS cluster_id, q.quality_score
    FROM q WHERE q.doc_id NOT IN (SELECT node FROM clusters)
    """,
    gate=False,
)
def cluster_best_keepers(spark, sf_dir):
    """Quality-aware dedup keep-list: every dup cluster keeps its
    highest-quality member (ties → lowest id), singletons keep
    themselves — production dedup keeps the best copy, not the
    lowest-id copy.  Composed from the gated cluster and quality
    queries; two hash-aggs on the cluster key + one anti-join
    (operators/dedup.py:best_quality_keepers)."""
    docs = table(spark, sf_dir, "documents")
    clusters = dedup_clusters(spark, sf_dir)
    scored = X.quality_scores(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    return D.best_quality_keepers(clusters, scored, "doc_id", "quality_score")


_VOCAB_K = 200


@query(
    "vocab_table",
    oracle=rf"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents),
    w2 AS (SELECT * FROM words WHERE term <> ''),
    counts AS (
      SELECT term, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
      FROM w2 GROUP BY term),
    top AS (
      SELECT * FROM counts
      ORDER BY n_occurrences DESC, term ASC LIMIT {_VOCAB_K})
    SELECT term, n_occurrences, n_docs,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term ASC)
                AS INT) AS token_id
    FROM top
    """,
    gate=False,
)
def vocab_table(spark, sf_dir):
    """Frequency-ranked tokenizer vocabulary: top-200 terms with
    contiguous token ids.  The cap runs as TakeOrdered; the id window
    touches only the capped rows, never the Zipf tail
    (operators/text.py:vocab_table)."""
    docs = table(spark, sf_dir, "documents")
    return X.vocab_table(docs, "doc_id", "text", max_vocab=_VOCAB_K)


@query(
    "tokenize_docs",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents),
    words AS (
      SELECT doc_id, unnest(ws) AS term,
             unnest(range(1, len(ws) + 1)) AS pos
      FROM w),
    counts AS (
      SELECT term, COUNT(*) AS n_occurrences
      FROM words WHERE term <> '' GROUP BY term),
    vocab AS (
      SELECT term,
             CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term ASC)
                  AS INT) AS token_id
      FROM (SELECT * FROM counts
            ORDER BY n_occurrences DESC, term ASC LIMIT {{k}}) t)
    SELECT doc_id,
           array_to_string(array_agg(coalesce(v.token_id, 0) ORDER BY pos),
                           ' ') AS token_ids,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov
    FROM words LEFT JOIN vocab v USING (term)
    WHERE term <> ''
    GROUP BY doc_id
    """.replace("{k}", str(_VOCAB_K)),
    # gated since the round-5 continuation: the tokenization step's
    # driver-visible representative
)
def tokenize_docs(spark, sf_dir):
    """Corpus tokenization against the built vocabulary: every document
    becomes its positional token-id array with OOV -> 0 (UNK; vocab
    ids are 1-based).  The tokenization step between vocab_table and
    sequence packing — posexplode, broadcast-size vocab equi-join (the
    corpus never shuffles on the term key), one hash agg per doc with
    the (pos, id) sort INSIDE the collected array
    (operators/text.py:tokenize_docs).

    Gate-facing projection only: ``token_ids`` is emitted as a
    space-joined string on BOTH sides (order is positional, no sort
    needed) because the driver's canonicalizer hashes flat values and
    chokes on list-typed cells — the stage_users pattern
    (queries_relational.py:333-347).  operators/text.py keeps the real
    ARRAY<INT> type for the packing pipeline."""
    docs = table(spark, sf_dir, "documents")
    vocab = X.vocab_table(docs, "doc_id", "text", max_vocab=_VOCAB_K)
    toks = X.tokenize_docs(docs, "doc_id", "text", vocab)
    return toks.select(
        "doc_id",
        F.array_join("token_ids", " ").alias("token_ids"),
        "n_tokens",
        "n_oov",
    )


@query(
    "bpe_merges",
    # no SQL oracle: k rounds of argmax-then-rewrite are not
    # expressible as one DuckDB query — the deterministic verdict is
    # the pure-Python reference BPE in tests/test_bpe.py (exact match
    # of every (rank, a, b, merged, n) row at sf0.001), plus the
    # driver's rows-only check here
    gate=False,  # text-agg family: tokenize_docs carries the gate
)
def bpe_merges(spark, sf_dir):
    """Distributed BPE merge training over the documents corpus
    (operators/text.py:bpe_train — r12, VERDICT r11 task 5): 12 merge
    rules learned from the distinct-word dictionary (weighted by
    occurrence count, min_count=2 trims the hapax tail), each round
    one map-side-combinable pair-count hash-agg + a per-partition
    top-1 argmax, merges applied incrementally to only the words that
    contain the winning pair.  Deterministic: the argmax ordering
    (count DESC, a ASC, b ASC) is total, so the merge sequence is a
    pure function of the corpus."""
    docs = table(spark, sf_dir, "documents")
    return X.bpe_train(
        docs, "doc_id", "text", n_merges=12, min_count=2
    ).orderBy("rank")


@query(
    "bpe_tokenize",
    gate=False,  # companion of bpe_merges: same deterministic-verdict
    # pytest oracle (reference encode), rows-only at the driver
)
def bpe_tokenize(spark, sf_dir):
    """Subword tokenization with the trained merge table
    (tokenize_docs(merges=...) -> bpe_encode): merges apply to the
    distinct-word dictionary (each unique word encodes once), token
    ids come from a frequency-ranked subword vocabulary, documents
    rebuild positionally.  token_ids flattens to a string for the
    driver canonicalizer, like tokenize_docs."""
    docs = table(spark, sf_dir, "documents")
    merges = X.bpe_train(docs, "doc_id", "text", n_merges=12, min_count=2)
    toks = X.tokenize_docs(docs, "doc_id", "text", merges=merges)
    return toks.select(
        "doc_id",
        F.array_join("token_ids", " ").alias("token_ids"),
        "n_tokens",
        "n_oov",
    )


_WIN_W, _WIN_S = 40, 30


@query(
    "long_doc_windows",
    oracle=rf"""
    WITH w AS ({_words_sql("SELECT * FROM documents WHERE len(trim(text)) > 0")}),
    n AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) <= {_WIN_W} THEN 1
                  ELSE CAST(ceil((len(ws) - {_WIN_W}) / {_WIN_S}.0) AS BIGINT) + 1
             END AS n_pieces
      FROM w),
    p AS (
      SELECT doc_id,
             unnest(range(0, n_pieces)) AS piece_idx,
             ws
      FROM n)
    SELECT doc_id, CAST(piece_idx AS INT) AS piece_idx,
           array_to_string(list_slice(ws, piece_idx * {_WIN_S} + 1,
                                      piece_idx * {_WIN_S} + {_WIN_W}), ' ')
             AS piece,
           len(list_slice(ws, piece_idx * {_WIN_S} + 1,
                          piece_idx * {_WIN_S} + {_WIN_W})) AS n_words
    FROM p
    """,
    gate=False,
)
def long_doc_windows(spark, sf_dir):
    """Long-document splitting: strided overlapping windows (40 words,
    stride 30) so documents beyond the context length are kept whole-
    coverage with boundary overlap — one split + posexplode, no
    shuffle (operators/dedup.py:window_chunks)."""
    docs = table(spark, sf_dir, "documents")
    return D.window_chunks(
        docs, "doc_id", "text", window_words=_WIN_W, stride_words=_WIN_S
    )


@query(
    "text_normalization",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             '\s+', ' ', 'g')) AS clean_text,
           length(text) - length(trim(regexp_replace(
             regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             '\s+', ' ', 'g'))) AS n_removed_chars
    FROM documents
    """,
    gate=False,
)
def text_normalization(spark, sf_dir):
    """Pre-filter cleanup: control-char strip + whitespace collapse +
    trim with the per-doc removal count — zero-shuffle codegen map
    (operators/text.py:normalize_corpus)."""
    return X.normalize_corpus(table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "packed_sequences",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text, '\S+')) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {_PACK_SHARDS} AS shard
      FROM documents),
    b AS (
      SELECT doc_id, text, n_tokens, shard,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / {_PACK_BUDGET}) AS BIGINT) AS bin_idx
      FROM t)
    SELECT shard, bin_idx, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           string_agg(text, '<|eos|>' ORDER BY doc_id) AS packed_text
    FROM b GROUP BY shard, bin_idx
    """,
    gate=False,
)
def packed_sequences(spark, sf_dir):
    """The materialized packing artifact: per (shard, bin) the
    concatenated training sequence with document boundaries — what the
    trainer actually consumes after ``sequence_packing`` assigns slots.
    One extra hash-agg on the (shard, bin) key; concatenation order is
    the same content-derived (doc id) order as the bin assignment, via
    an in-array sort — no window beyond the packing's own
    (operators/packing.py:pack_sequences)."""
    docs = table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", "text", X._count(r"\S+", F.col("text")).alias("n_tok")
    )
    packed = P.pack_sequences(
        with_tokens.select("doc_id", "n_tok"),
        "doc_id",
        "n_tok",
        budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
    )
    joined = packed.join(with_tokens.select("doc_id", "text"), "doc_id")
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id").alias("i"), F.col("text").alias("t")))
    )
    return joined.groupBy("shard", "bin_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.array_join(
            F.transform(parts, lambda x: x["t"]), "<|eos|>"
        ).alias("packed_text"),
    )


@query(
    "ann_quantized_topk",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    m AS (SELECT vec_id, e,
            list_max(list_transform(e, x -> abs(x))) / 127 AS scale FROM v),
    q AS (SELECT vec_id,
            list_transform(e, x -> coalesce(CAST(round(x / scale) AS INT), 0))
              AS qv
          FROM m),
    qs AS (SELECT * FROM q WHERE vec_id < 5),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(qs.qv, c.qv)
                   / sqrt(list_dot_product(c.qv, c.qv)
                          * list_dot_product(qs.qv, qs.qv)), 6) AS score
      FROM qs JOIN q c ON c.vec_id <> qs.vec_id)
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
    gate=False,
)
def ann_quantized_topk(spark, sf_dir):
    """Cosine top-3 over the int8 storage tier: the per-vector scale
    cancels in cosine, so ranking runs on EXACT integer dot products
    (order-free — no float accumulation anywhere) with one final float
    division — fully hash-oracled, unlike any float-accumulating ANN
    tier.  Recall vs the exact float path is pinned in
    tests/test_quantization.py
    (operators/similarity.py:quantized_cosine_topk)."""
    e = table(spark, sf_dir, "embeddings")
    out = S.quantized_cosine_topk(e, e.filter(F.col("vec_id") < 5), k=3)
    return out.select("query_id", "neighbor_id", "score", "rk")


@query(
    "dataset_split_counts",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 98 THEN 'train'
                WHEN bucket = 98 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs
    FROM s GROUP BY 1
    """,
    gate=False,
)
def dataset_split_counts(spark, sf_dir):
    """Deterministic train/valid/test assignment (98/1/1) by salted
    content hash — the split a training pipeline must reproduce across
    engines, re-runs, and cluster sizes; hash-mod like the mixing
    sampler, one narrow map + one hash-agg."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 98, F.lit("train"))
        .when(bucket == 98, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select(split.alias("split")).groupBy("split").agg(
        F.count("*").alias("n_docs")
    )


@query(
    "embedding_quantization",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    m AS (SELECT vec_id, e,
            list_max(list_transform(e, x -> abs(x))) / 127 AS scale FROM v),
    q AS (SELECT vec_id, e, scale,
            list_transform(e, x -> coalesce(CAST(round(x / scale) AS INT), 0))
              AS qv
          FROM m)
    SELECT vec_id, ROUND(scale, 9) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           len(list_filter(qv, x -> abs(x) = 127)) AS n_saturated
    FROM q
    """,
    gate=False,
)
def embedding_quantization(spark, sf_dir):
    """int8 vector storage tier: per-vector symmetric quantization
    (scale = max|x|/127) — 4× smaller embeddings for the 100 TB corpus.
    The hash oracle anchors on the INTEGER-EXACT columns (signed and
    absolute checksums of the int8 codes, saturation count) plus the
    one-division scale; the float reconstruction bound ``rel_err`` is
    deliberately NOT hash-compared — its last-ulp value shifts with
    codegen subexpression sharing (plan-shape-dependent FMA-style
    fusion, observed ±1e-8) — and is tolerance-pinned in
    tests/test_quantization.py instead
    (operators/similarity.py:quantize_embeddings)."""
    out = S.quantize_embeddings(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding", bits=8
    )
    return out.select(
        "vec_id",
        "scale",
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("q_sum"),
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x).cast("long")
        ).alias("q_l1"),
        F.size(F.filter("q", lambda x: F.abs(x) == 127)).alias("n_saturated"),
    )


@query("embedding_near_dup_lsh", oracle=_emb_lsh_pairs_oracle(), gate=False)
def embedding_near_dup_lsh(spark, sf_dir):
    """The bucketed scale path for embedding near-dup: pairs only form
    inside an integer-exact hyperplane-signature bucket (equi-join on
    the bucket key — no all-pairs join anywhere), exact cosine
    thresholds the candidates.  Fully hash-oracled because the bucket
    bits are exact integer arithmetic, like ann_lsh_topk
    (operators/similarity.py:lsh_near_dup_pairs)."""
    e = table(spark, sf_dir, "embeddings")
    return S.lsh_near_dup_pairs(
        e, "vec_id", "embedding", dim=_DIM, n_planes=_N_PLANES, threshold=0.4
    )


@query(
    "split_leakage_pairs",
    oracle=f"""
    WITH p AS ({_PAIRS}),
    s AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                       1, 8))::BIGINT % 100 < 50
                  THEN 'train' ELSE 'heldout' END AS split
      FROM documents)
    SELECT p.id_a AS id_a, p.id_b AS id_b,
           sa.split AS split_a, sb.split AS split_b
    FROM p
    JOIN s sa ON sa.doc_id = p.id_a
    JOIN s sb ON sb.doc_id = p.id_b
    WHERE sa.split <> sb.split
    """,
    gate=False,  # dedup-family composition; lsh_candidate_pairs gated
)
def split_leakage_pairs(spark, sf_dir):
    """Train/heldout LEAKAGE audit: near-duplicate candidate pairs that
    CROSS the split boundary — the eval-hygiene check a training
    pipeline runs before committing a split (a held-out doc with a
    near-dup in train inflates eval).  Composes the keeper-guarded LSH
    candidates with the deterministic hash-mod split (50/50 audit
    variant so the boundary is dense); two broadcast-size joins onto
    the bounded pair set — the corpus is never re-shuffled."""
    pairs = lsh_candidate_pairs(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    s = docs.select(
        "doc_id",
        F.when(bucket < 50, F.lit("train")).otherwise(F.lit("heldout")).alias(
            "split"
        ),
    )
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b")
    )


@query(
    "ann_ivf_int_topk",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    m AS (SELECT vec_id, label, e,
            list_max(list_transform(e, x -> abs(x))) / 127 AS scale FROM v),
    q AS (SELECT vec_id, label,
            list_transform(e, x -> coalesce(CAST(round(x / scale) AS BIGINT), 0))
              AS qv
          FROM m),
    pos AS (SELECT label, unnest(qv) AS x,
                   unnest(range(1, len(qv) + 1)) AS i FROM q),
    cent AS (
      SELECT label, array_agg(s ORDER BY i) AS cvec
      FROM (SELECT label, i, CAST(SUM(x) AS BIGINT) AS s
            FROM pos GROUP BY 1, 2) t
      GROUP BY label),
    qs AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id < 5),
    probe AS (
      SELECT query_id, label FROM (
        SELECT qs.query_id, cent.label,
               ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY
                 list_dot_product(cent.cvec, qs.qv)
                 / sqrt(list_dot_product(cent.cvec, cent.cvec)
                        * list_dot_product(qs.qv, qs.qv)) DESC,
                 cent.label ASC) AS prk
        FROM qs CROSS JOIN cent) p
      WHERE prk <= 4),
    cand AS (
      SELECT qs.query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(c.qv, qs.qv)
                   / sqrt(list_dot_product(c.qv, c.qv)
                          * list_dot_product(qs.qv, qs.qv)), 6) AS score
      FROM probe
      JOIN qs ON qs.query_id = probe.query_id
      JOIN q c ON c.label = probe.label AND c.vec_id <> qs.query_id)
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM cand) r
    WHERE rk <= 3
    """,
    gate=False,
)
def ann_ivf_int_topk(spark, sf_dir):
    """IVF ANN with INTEGER centroids — the deterministic twin of
    ann_ivf_topk: per-cluster probe targets are integer SUMS of int8
    codes (order-free), candidate ranking is the exact integer-dot
    cosine, so the whole plan is bit-reproducible and carries the full
    hash oracle the float-mean IVF cannot (its centroid depends on
    float accumulation order).  n_probe=4, matching the float path's
    setting on this unstructured gate table
    (operators/similarity.py:ivf_int_topk; recall floor pinned in
    tests/test_ann_recall.py)."""
    e = table(spark, sf_dir, "embeddings")
    out = S.ivf_int_topk(e, e.filter(F.col("vec_id") < 5), k=3, n_probe=4)
    return out.select("query_id", "neighbor_id", "score", "rk")


# shared by ann_maintained_topk and its streaming twin: membership is
# the FULL corpus either way (train subset + synced/streamed rest), so
# both must serve byte-identical results
_ANN_MAINTAINED_ORACLE = """
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    m AS (SELECT vec_id, label, e,
            list_max(list_transform(e, x -> abs(x))) / 127 AS scale FROM v),
    q AS (SELECT vec_id, label,
            list_transform(e, x -> coalesce(CAST(round(x / scale) AS BIGINT), 0))
              AS qv
          FROM m),
    pos AS (SELECT label, unnest(qv) AS x,
                   unnest(range(1, len(qv) + 1)) AS i
            FROM q WHERE vec_id % 3 = 0),
    cent AS (
      SELECT CAST(label AS VARCHAR) AS cluster, array_agg(s ORDER BY i) AS cvec
      FROM (SELECT label, i, CAST(SUM(x) AS BIGINT) AS s
            FROM pos GROUP BY 1, 2) t
      GROUP BY label),
    assign AS (
      SELECT vec_id, qv, cluster FROM (
        SELECT q.vec_id, q.qv, cent.cluster,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product(cent.cvec, q.qv)
                 / sqrt(list_dot_product(cent.cvec, cent.cvec)
                        * list_dot_product(q.qv, q.qv)) DESC,
                 cent.cluster ASC) AS ark
        FROM q CROSS JOIN cent) a
      WHERE ark = 1),
    qs AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id < 5),
    probe AS (
      SELECT query_id, cluster FROM (
        SELECT qs.query_id, cent.cluster,
               ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY
                 list_dot_product(cent.cvec, qs.qv)
                 / sqrt(list_dot_product(cent.cvec, cent.cvec)
                        * list_dot_product(qs.qv, qs.qv)) DESC,
                 cent.cluster ASC) AS prk
        FROM qs CROSS JOIN cent) p
      WHERE prk <= 4),
    cand AS (
      SELECT qs.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(a.qv, qs.qv)
                   / sqrt(list_dot_product(a.qv, a.qv)
                          * list_dot_product(qs.qv, qs.qv)), 6) AS score
      FROM probe
      JOIN qs ON qs.query_id = probe.query_id
      JOIN assign a ON a.cluster = probe.cluster
                   AND a.vec_id <> qs.query_id)
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM cand) r
    WHERE rk <= 3
    """


@query(
    "ann_maintained_topk",
    oracle=_ANN_MAINTAINED_ORACLE,
    gate=False,  # ANN lifecycle: ann_cdf_upsert_topk subsumes this sync path (r14 rotation)
)
def ann_maintained_topk(spark, sf_dir):
    """MAINTAINED IVF index (round 10, VERDICT r9 task 5): centroids
    train ONCE on a third of the corpus and freeze in the warehouse;
    the remaining vectors arrive as two incremental syncs (assignment
    to nearest stored centroid — a broadcast over the centroid table,
    never a corpus pass); queries then probe the STORED index.  The
    one-shot ``ivf_int_topk`` recomputes centroids per call — O(corpus)
    per query batch at 100 TB; this is the amortized replacement.  The
    oracle rebuilds the frozen codebook from the train subset, assigns
    every vector to its nearest centroid, and serves the same
    integer-exact probe/scoring — index-served == recompute-served is
    additionally pinned in tests/test_ann_index.py
    (plans/ann_index.py:IncrementalANNSync)."""
    from ..fs import scratch_dir
    from .ann_index import IncrementalANNSync

    root = scratch_dir(spark, "anni_", cleanup_atexit=True)
    idx = IncrementalANNSync(spark, root, "agg.ann")
    e = table(spark, sf_dir, "embeddings")
    idx.train(e.filter(F.col("vec_id") % 3 == 0))
    idx.sync(e.filter(F.col("vec_id") % 3 == 1))
    idx.sync(e.filter(F.col("vec_id") % 3 == 2))
    out = idx.topk(e.filter(F.col("vec_id") < 5), k=3, n_probe=4)
    return out.select("query_id", "neighbor_id", "score", "rk")


@query(
    "ann_streaming_topk",
    oracle=_ANN_MAINTAINED_ORACLE,
    gate=False,  # ANN family: ann_lsh_topk carries the gate
)
def ann_streaming_topk(spark, sf_dir):
    """The STREAMING maintenance twin of ann_maintained_topk: the
    non-training vectors arrive as a vector stream
    (``StreamingANNSync`` — foreachBatch assignment to the frozen
    codebook, exactly-once via a dedicated watermark app id), and the
    served top-k must be IDENTICAL to the batch-maintained index —
    same oracle, byte for byte (plans/ann_index.py,
    streaming/pipeline_stream.py:StreamingANNSync)."""
    import os

    from ..fs import scratch_dir
    from ..streaming.pipeline_stream import StreamingANNSync

    root = scratch_dir(spark, "anns_", cleanup_atexit=True)
    e = table(spark, sf_dir, "embeddings")
    src = os.path.join(root, "_vector_stream")
    e.filter(F.col("vec_id") % 3 != 0).write.mode("overwrite").parquet(src)
    s = StreamingANNSync(spark, root, src, "agg.ann")
    s.idx.train(e.filter(F.col("vec_id") % 3 == 0))
    s.run_once()
    out = s.topk(e.filter(F.col("vec_id") < 5), k=3, n_probe=4)
    return out.select("query_id", "neighbor_id", "score", "rk")


@query(
    "ann_cdf_upsert_topk",
    oracle="""
    WITH raw AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
    init AS (SELECT vec_id, label, e FROM raw WHERE vec_id % 4 <> 3),
    fin AS (
      SELECT vec_id, label,
             CASE WHEN vec_id % 4 = 1 THEN list_reverse(e) ELSE e END AS e
      FROM raw WHERE vec_id % 4 <> 2),
    im AS (SELECT vec_id, label, e,
             list_max(list_transform(e, x -> abs(x))) / 127 AS scale
           FROM init),
    iq AS (SELECT vec_id, label,
             list_transform(e, x -> coalesce(CAST(round(x / scale) AS BIGINT), 0))
               AS qv
           FROM im),
    pos AS (SELECT label, unnest(qv) AS x,
                   unnest(range(1, len(qv) + 1)) AS i FROM iq),
    cent AS (
      SELECT CAST(label AS VARCHAR) AS cluster, array_agg(s ORDER BY i) AS cvec
      FROM (SELECT label, i, CAST(SUM(x) AS BIGINT) AS s
            FROM pos GROUP BY 1, 2) t
      GROUP BY label),
    fm AS (SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127 AS scale
           FROM fin),
    fq AS (SELECT vec_id,
             list_transform(e, x -> coalesce(CAST(round(x / scale) AS BIGINT), 0))
               AS qv
           FROM fm),
    assign AS (
      SELECT vec_id, qv, cluster FROM (
        SELECT fq.vec_id, fq.qv, cent.cluster,
               ROW_NUMBER() OVER (PARTITION BY fq.vec_id ORDER BY
                 list_dot_product(cent.cvec, fq.qv)
                 / sqrt(list_dot_product(cent.cvec, cent.cvec)
                        * list_dot_product(fq.qv, fq.qv)) DESC,
                 cent.cluster ASC) AS ark
        FROM fq CROSS JOIN cent) a
      WHERE ark = 1),
    qm AS (SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127 AS scale
           FROM raw WHERE vec_id < 5),
    qs AS (SELECT vec_id AS query_id,
             list_transform(e, x -> coalesce(CAST(round(x / scale) AS BIGINT), 0))
               AS qv
           FROM qm),
    probe AS (
      SELECT query_id, cluster FROM (
        SELECT qs.query_id, cent.cluster,
               ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY
                 list_dot_product(cent.cvec, qs.qv)
                 / sqrt(list_dot_product(cent.cvec, cent.cvec)
                        * list_dot_product(qs.qv, qs.qv)) DESC,
                 cent.cluster ASC) AS prk
        FROM qs CROSS JOIN cent) p
      WHERE prk <= 4),
    cand AS (
      SELECT qs.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(a.qv, qs.qv)
                   / sqrt(list_dot_product(a.qv, a.qv)
                          * list_dot_product(qs.qv, qs.qv)), 6) AS score
      FROM probe
      JOIN qs ON qs.query_id = probe.query_id
      JOIN assign a ON a.cluster = probe.cluster
                   AND a.vec_id <> qs.query_id)
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM cand) r
    WHERE rk <= 3
    """,
)
def ann_cdf_upsert_topk(spark, sf_dir):
    """Retraction-aware ANN maintenance over an UPSERTED source (round
    11, the r10 verdict's one weak mark): the index trains + anchors
    its change-feed cursor on a governed corpus snapshot
    (``train_from_table``), the source then takes a MERGE exercising
    every CDF class — one id range's vectors UPDATE (reversed), an
    adjacent range DELETES, a withheld range INSERTS — and
    ``sync_from_cdf`` absorbs the row-level feed: stale assignments
    retract via the stats-bounded merge on the assignments table,
    postimages re-assign against the FROZEN codebook, exactly-once per
    source version, cost O(changed keys) instead of the O(corpus)
    retrain the append-only feed forced.  The oracle rebuilds the
    frozen codebook from the initial snapshot and recomputes the
    post-merge assignment + probe + integer-exact scoring from
    scratch — a leaked stale assignment, a missed insert, or a
    double-indexed update breaks the hash
    (plans/ann_index.py:IncrementalANNSync.sync_from_cdf)."""
    from ..fs import scratch_dir
    from .ann_index import IncrementalANNSync
    from .table_format import ManifestFormat

    root = scratch_dir(spark, "annc_", cleanup_atexit=True)
    fmt = ManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("vec_id",),
        cdf=True,  # the index maintains from the row-level change feed
    )
    idx = IncrementalANNSync(spark, root, "agg.ann", table_format=fmt)
    e = table(spark, sf_dir, "embeddings")
    fmt.write("raw.vecs", e.filter(F.col("vec_id") % 4 != 3), "overwrite")
    idx.train_from_table(fmt, "raw.vecs")
    updates = e.filter(F.col("vec_id") % 4 == 1).withColumn(
        "embedding", F.reverse("embedding")
    )
    inserts = e.filter(F.col("vec_id") % 4 == 3)
    batch = updates.unionByName(inserts)
    keys = batch.select("vec_id").unionByName(
        e.filter(F.col("vec_id") % 4 == 2).select("vec_id")
    )
    fmt.merge("raw.vecs", batch, "vec_id", delete_keys=keys)
    idx.sync_from_cdf(fmt, "raw.vecs")
    out = idx.topk(e.filter(F.col("vec_id") < 5), k=3, n_probe=4)
    return out.select("query_id", "neighbor_id", "score", "rk")


@query(
    "rag_context_assembly",
    oracle=f"""
    WITH v AS ({_VECS}), q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS score
      FROM q JOIN v c ON c.vec_id <> q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id ASC) AS rk
      FROM scored),
    cand AS (
      SELECT r.query_id, r.rk, d.text,
             len(regexp_split_to_array(trim(d.text), '\\s+')) AS toks
      FROM ranked r JOIN documents d ON d.doc_id = r.neighbor_id
      WHERE r.rk <= 8),
    fitted AS (
      SELECT *, SUM(toks) OVER (PARTITION BY query_id ORDER BY rk
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM cand)
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_ctx,
           CAST(SUM(toks) AS BIGINT) AS ctx_tokens,
           CAST(LENGTH(STRING_AGG(text, ' | ' ORDER BY rk)) AS BIGINT)
               AS ctx_len
    FROM fitted WHERE cum <= 256
    GROUP BY query_id
    """,
    gate=True,  # r14 rotation: the r13 RAG flagship drives a gate row
)
def rag_context_assembly(spark, sf_dir):
    """RAG-shaped retrieval pipeline end-to-end (r13): exact cosine
    top-8 recall per query -> document join -> token-budget-bounded
    context assembly in rank order — the two-stage shape every
    retrieval-augmented training/eval pipeline needs, composed from
    the engine's own pieces (`operators/similarity.py` top-k,
    whitespace token counts, running-sum budget cut, ordered
    ``collect_list(struct)`` assembly — no global sort, no UDF).

    100-TB shape: the candidate set is bounded by queries x k, so the
    document join broadcasts the CANDIDATES against the corpus (never
    the reverse), the budget cut is a per-query window over <= k rows,
    and the recall stage swaps to the IVF/LSH variants unchanged
    (same output contract).  Budget = 256 whitespace tokens; neighbors
    that do not fit are dropped whole (no mid-document truncation)."""
    from pyspark.sql.window import Window

    cand_k, budget = 8, 256
    e = table(spark, sf_dir, "embeddings")
    d = table(spark, sf_dir, "documents")
    topk = S.cosine_topk(e, e.filter(F.col("vec_id") < 5), k=cand_k)
    cand = (
        d.join(
            F.broadcast(topk.select("query_id", "neighbor_id", "rk")),
            F.col("doc_id") == F.col("neighbor_id"),
        )
        .select(
            "query_id", "rk", "text",
            F.size(F.split(F.trim("text"), r"\s+")).alias("toks"),
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fitted = cand.withColumn("cum", F.sum("toks").over(w)).filter(
        F.col("cum") <= budget
    )
    return fitted.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_ctx"),
        F.sum("toks").alias("ctx_tokens"),
        F.length(
            F.concat_ws(
                " | ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "text"))),
                    lambda t: t.getField("text"),
                ),
            )
        ).cast("long").alias("ctx_len"),
    )
