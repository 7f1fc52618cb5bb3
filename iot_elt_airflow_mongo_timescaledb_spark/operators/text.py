"""Text-analysis operators for training-data curation.

Language-ID (stopword-marker heuristic), quality scoring, token
counting (whitespace + BPE-ish pre-tokenizer regex), and document
fingerprinting.  All pure ``pyspark.sql.functions`` expressions —
regex patterns are kept to constructs with identical semantics in
Java regex (Spark) and RE2 (DuckDB/oracle): character classes,
alternation, ``\\b`` word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .partitioning import ensure_min_parallelism

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# deterministic per-language marker words for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|to)\b",
    "fr": r"\b(le|la|les|et|des)\b",
    "es": r"\b(el|los|las|y|que)\b",
    "de": r"\b(der|die|das|und|ist)\b",
}

STOPWORDS_PATTERN = r"\b(the|a|of|and|to|in|is|it)\b"


def _count(pattern: str, col) -> F.Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count + char length."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        _count(r"\S+", t).alias("n_ws_tokens"),
        _count(BPE_PATTERN, t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_measured"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword quality heuristics.

    All ratios rounded to 6 dp (they are small-int rationals; rounding
    only guards the float division).
    """
    t = F.col(text_col)
    n_words = _count(r"\S+", t)
    n_alpha = _count(r"[a-zA-Z]", t)
    n_punct = _count(r"[^a-zA-Z0-9\s]", t)
    n_stop = _count(STOPWORDS_PATTERN, t)
    # try_divide: an empty/whitespace-only doc (n_words = 0 or length 0)
    # scores NULL instead of aborting the job — Spark 4 runs ANSI by
    # default, where a plain `/` throws DIVIDE_BY_ZERO, and one junk
    # document must never kill a corpus-wide curation run.  DuckDB's `/`
    # yields NULL on zero, so the oracle agrees bit-for-bit.
    avg_word_len = F.round(F.try_divide(n_alpha, n_words), 6)
    punct_ratio = F.round(F.try_divide(n_punct, F.length(t)), 6)
    stopword_ratio = F.round(F.try_divide(n_stop, n_words), 6)
    score = F.round(
        F.least(n_words / F.lit(200.0), F.lit(1.0)) * 0.4
        + stopword_ratio * 0.4
        + (1 - punct_ratio) * 0.2,
        6,
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str, actual_col: str | None = None) -> DataFrame:
    """Marker-stopword language classifier (argmax of per-language marker
    hits, alphabetical tie-break, 'und' when no marker fires)."""
    t = F.lower(F.col(text_col))
    scores = {lang: _count(pat, t) for lang, pat in LANG_MARKERS.items()}
    # argmax with deterministic tie-break: compare (score, reversed-lang)
    pred = F.lit("und")
    best = F.lit(0)
    for lang in sorted(LANG_MARKERS, reverse=True):
        s = scores[lang]
        pred = F.when(s >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)
    cols = [F.col(id_col)]
    cols += [scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)]
    cols.append(pred.alias("pred_lang"))
    if actual_col:
        cols.append(F.col(actual_col).alias("actual_lang"))
        cols.append((pred == F.col(actual_col)).alias("is_match"))
    return df.select(*cols)


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprints: full md5 of normalized text, a 64-bit hex
    prefix, and a coarse length bucket (for banded near-dup blocking)."""
    norm = normalize_text(F.col(text_col))
    fp = F.md5(norm)
    return df.select(
        F.col(id_col),
        fp.alias("fp_md5"),
        F.substring(fp, 1, 16).alias("fp_prefix64"),
        F.floor(F.length(norm) / 100).cast("long").alias("len_bucket"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 1, min_df: int = 1
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = term count in doc; idf = ln((N+1)/(df+1)) with add-one
    smoothing (N = docs with ≥1 token).  All shuffles are on bounded
    keys (term or doc id).

    Scale notes: real corpora have unbounded vocabularies (typos, ids,
    URLs — vocabulary grows ~ with corpus size), so the doc-frequency
    table must NOT be force-broadcast: the tf⋈df join is left unhinted
    and AQE picks broadcast only when the aggregated df side is actually
    under ``spark.sql.autoBroadcastJoinThreshold``, falling back to a
    shuffled join on the bounded ``term`` key otherwise.  ``min_df``
    prunes the hapax tail before the join (df < min_df terms can never
    be informative top-k terms at corpus scale and are the bulk of the
    vocabulary by Zipf); the default 1 keeps exact parity with the SQL
    oracle.

    The document count N is part of the SAME lazy plan (a broadcast
    1-row aggregate over the tf table, not a separate ``count()``
    action): all three consumers of the (doc, term) aggregate — scores,
    doc-frequency, and N — hang off one exchange that AQE reuses, so
    the corpus is tokenized exactly once per action.
    """
    from pyspark.sql.window import Window

    words = ensure_min_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    if min_df > 1:
        doc_freq = doc_freq.filter(F.col("df") >= min_df)
    # N as a lazy 1-row broadcast (docs with ≥1 token); derived from tf so
    # it reuses tf's exchange instead of re-scanning the corpus
    n_docs = F.broadcast(
        tf.select(id_col).distinct().agg(F.count("*").alias("__n_docs"))
    )
    scored = tf.join(doc_freq, "term").crossJoin(n_docs).select(
        F.col(id_col),
        "term",
        F.round(
            F.col("tf")
            * F.log((F.col("__n_docs") + F.lit(1)) / (F.col("df") + F.lit(1.0))),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", "rk")
    )


def repetition_scores(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family): the
    fraction of word n-grams taken by the single most frequent n-gram,
    and the fraction covered by any repeated n-gram.

    Boilerplate, keyword-stuffed, and degenerate generated text score
    high on both; production curation thresholds them alongside the
    length/stopword heuristics of ``quality_scores``.  One explode +
    two hash-aggs on (doc, gram) — multiplicity kept (unlike the
    dedup shingles, which are distinct sets).
    """
    from .dedup import gram_expr

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), words.alias("__w"))
        .filter(F.size("__w") >= n)
        .select(F.col(id_col), F.explode(F.expr(gram_expr("__w", n))).alias("g"))
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_gram_frac"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 6
        ).alias("dup_gram_frac"),
    )


# Conservative patterns valid in both Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"[0-9]{2,3}-[0-9]{3,4}-[0-9]{4}", "[PHONE]"),
    "id_tag": (r"#[0-9]{3,}", "[ID]"),
    "digit_run": (r"[0-9]{9,}", "[NUM]"),
}


def pii_scan(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document PII census + redaction.

    For each named pattern: a match count column ``n_<name>``, plus one
    ``redacted`` column with every pattern replaced by its token —
    replacements applied in dict order, so an earlier pattern's token is
    never re-matched by a later one (counts are measured on the ORIGINAL
    text, before any replacement).

    Pure JVM expressions (``regexp_extract_all`` + ``regexp_replace``),
    codegen'd per row batch — no UDF, no shuffle; at 100 TB this is a
    narrow map over the corpus scan.  Patterns must avoid Java-only
    regex features so the DuckDB (RE2) oracle reproduces them exactly.
    """
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    cols = [F.col(id_col)]
    cols += [_count(pat, t).alias(f"n_{name}") for name, (pat, _) in pats.items()]
    red = t
    for pat, token in pats.values():
        red = F.regexp_replace(red, pat, token)
    cols.append(red.alias("redacted"))
    return df.select(*cols)


# ASCII control characters except \t \n \r (those become whitespace and
# collapse); kept to \xNN escapes valid in BOTH Java regex and RE2 —
# \uXXXX zero-width classes spell differently in the two engines and
# would break oracle parity.
CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_corpus(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pre-filter text normalization: strip control characters, collapse
    all whitespace runs to single spaces, trim — the cleanup every
    downstream operator (shingles, chunks, token counts) assumes.
    Reports per-doc characters removed so the cleaning rate is
    monitorable.  Pure codegen regexp chain: zero shuffle, a narrow map
    over the corpus scan.
    """
    t = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(t, CONTROL_CHARS, ""), r"\s+", " "
        )
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        (F.length(t) - F.length(cleaned)).alias("n_removed_chars"),
    )


def dsir_importance_weights(
    df: DataFrame, id_col: str, text_col: str, target_col: str
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — public method): per-document log importance weight
    ``log p_target(x) - log p_raw(x)`` under bag-of-words unigram
    models, where the target model is estimated from the rows whose
    boolean ``target_col`` is true (the in-domain sample) and the raw
    model from the whole corpus.  Documents resembling the target
    domain score high; resampling/selection by this weight composes
    with the existing selection machinery (``token_budget_cut`` for a
    budgeted head, ``dataset_split`` for held-out hygiene) — a global
    rank here would be a single-partition sort, so selection stays a
    separate, already-scalable step.

    Both models share the corpus vocabulary with add-1 smoothing
    (``(cf + 1) / (total + V)``), so unseen-in-target terms contribute
    a finite negative evidence instead of -inf.  Shape: ONE explode
    feeds the per-doc term counts and the two vocabulary counts (the
    ``unigram_logprob_scores`` pattern: two map-side-combinable
    hash-aggs off one exchange); the totals ride a 1-row broadcast;
    the probe join is AQE-chosen on the bounded term key.
    """
    words = ensure_min_parallelism(
        df.select(id_col, target_col, text_col), id_col
    ).select(
        F.col(id_col),
        F.col(target_col).alias("__tgt"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "__tgt", "term").agg(F.count("*").alias("tf"))
    voc = tf.groupBy("term").agg(
        F.sum("tf").alias("cf_all"),
        F.sum(F.when(F.col("__tgt"), F.col("tf")).otherwise(0)).alias("cf_t"),
    )
    totals = F.broadcast(
        voc.agg(
            F.sum("cf_all").alias("__ta"),
            F.sum("cf_t").alias("__tt"),
            F.count("*").alias("__v"),
        )
    )
    ratio = F.log((F.col("cf_t") + 1) / (F.col("__tt") + F.col("__v"))) - F.log(
        (F.col("cf_all") + 1) / (F.col("__ta") + F.col("__v"))
    )
    return (
        tf.join(voc, "term")
        .crossJoin(totals)
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * ratio), 6).alias("log_iw"),
        )
    )


def unigram_logprob_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus-unigram language-model score per document: mean token
    negative log-probability under the corpus's own unigram
    distribution — the perplexity-filter shape (CCNet ranks documents
    by LM perplexity and keeps the head; a KenLM model is not available
    in-container, so the LM is the corpus unigram MLE, which already
    separates gibberish/rare-token documents from ordinary prose).

    Lower = more typical text; high scores flag documents dominated by
    rare tokens.  Shape: one explode feeds BOTH the per-doc term counts
    and the corpus term-frequency table (two map-side-combinable
    hash-aggs off one exchange, the TF-IDF pattern), the corpus total
    rides a 1-row broadcast, and the probe join is AQE-chosen on the
    bounded term key.  Rounded to 6 dp (float log; same expression both
    engines).
    """
    words = ensure_min_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = F.broadcast(corpus.agg(F.sum("cf").alias("__total")))
    scored = tf.join(corpus, "term").crossJoin(total)
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.round(
            (-F.sum(F.col("tf") * F.log(F.col("cf") / F.col("__total")))
             / F.sum("tf")),
            6,
        ).alias("mean_neg_logprob"),
    )


def vocab_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_vocab: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary: the top ``max_vocab`` terms with
    contiguous ``token_id``s assigned by ``(count DESC, term ASC)`` —
    the tokenizer-vocabulary construction step (word-level here; a BPE
    trainer consumes the same table as its seed counts).

    Scale shape: one explode + one map-side-combinable hash-agg on the
    term key, then the cap runs as ``ORDER BY … LIMIT`` (per-partition
    top-K + a K-row merge, no global sort) and id assignment is a
    window over the ALREADY-CAPPED K rows — the single-partition window
    touches ``max_vocab`` rows, never the vocabulary tail (which by
    Zipf is almost all of it).
    """
    words = ensure_min_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    counts = words.groupBy("term").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_occurrences") >= min_count)
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("term").asc()
    ).limit(max_vocab)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    return top.withColumn("token_id", F.row_number().over(w))


def corpus_ngram_topk(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 20
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams: ``(gram, n_occurrences,
    n_docs)``, top-k by total occurrence count.

    The boilerplate-discovery / stop-gram census of a curation pipeline
    — the high-frequency grams this surfaces are what
    ``substring_dup_pairs``' ``max_df`` band excludes and what
    template-removal filters are built from.  Multiplicity is kept
    (unlike the dedup shingles); distinct-doc counts ride the same
    hash-agg.  Scale shape: explode → one map-side-combinable hash-agg
    on the gram key → global top-k as ``ORDER BY … LIMIT k``, which
    Spark executes as per-partition top-k + a k-row driver merge
    (TakeOrderedAndProject) — no global sort materializes.
    """
    from .dedup import gram_expr

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), words.alias("__w"))
        .filter(F.size("__w") >= n)
        .select(F.col(id_col), F.explode(F.expr(gram_expr("__w", n))).alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )


def tokenize_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame | None = None,
    oov_id: int = 0,
    merges: DataFrame | None = None,
) -> DataFrame:
    """Apply a ``(term, token_id)`` vocabulary to a corpus — the
    tokenization step between ``vocab_table`` and sequence packing:
    each document becomes its positional token-id array, with
    out-of-vocabulary words mapped to ``oov_id`` (the UNK id; vocab ids
    are 1-based so 0 is free).

    ``merges=`` (r12) switches to SUBWORD tokenization with a trained
    BPE merge table (``bpe_train``) instead of a word vocabulary —
    same output surface, delegated to :func:`bpe_encode`.

    Scale shape: posexplode -> equi-join on the term key -> one hash
    agg per document.  The vocabulary is capped (max_vocab rows) so AQE
    broadcasts the join side — the corpus never shuffles on the term
    key; the per-document array rebuild sorts (pos, id) structs INSIDE
    the aggregated list (sort_array on collected structs), not as a
    global window.  Returns (id, token_ids, n_tokens, n_oov); documents
    with no words yield no row, same as the word-split census queries.
    """
    if merges is not None:
        return bpe_encode(df, id_col, text_col, merges, oov_id=oov_id)
    if vocab is None:
        raise ValueError("tokenize_docs needs a vocab table or merges=")
    words = (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "pos", "term"
            ),
        )
        .filter(F.col("term") != "")
    )
    joined = words.join(
        vocab.select("term", F.col("token_id").cast("int").alias("token_id")),
        "term",
        "left",
    )
    tid = F.coalesce(F.col("token_id"), F.lit(int(oov_id))).cast("int")
    return joined.groupBy(id_col).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("pos"), tid.alias("tid")))
            ),
            lambda s: s["tid"],
        ).alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long")).alias("n_oov"),
    )


# -- BPE merge training (r12, VERDICT r11 task 5) ----------------------------

BPE_EOW = "</w>"


def _bpe_chars(term_col) -> F.Column:
    """A word's initial symbol sequence: its characters plus the
    end-of-word marker (Sennrich et al. 2016's formulation — the
    marker keeps word-final subwords distinct from word-internal
    ones)."""
    return F.concat(
        F.expr(
            "transform(sequence(1, length(term)), i -> substring(term, i, 1))"
        ),
        F.array(F.lit(BPE_EOW)),
    )


def _bpe_pair_flags(syms) -> F.Column:
    """Adjacent symbol pairs of one symbol array as structs."""
    return F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _bpe_apply_merge(syms, a: str, b: str) -> F.Column:
    """Leftmost non-overlapping replacement of the adjacent pair
    (a, b) with the merged symbol — one array fold, pure expressions
    (the per-word inner loop of BPE, vectorized under whole-stage
    codegen instead of Python)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 50,
    min_count: int = 1,
) -> DataFrame:
    """Distributed BPE merge TRAINING (Sennrich et al. 2016): learn
    ``n_merges`` merge rules from a corpus.  Returns the merge table
    ``(rank, a, b, merged, n)`` — rank is application order, n the
    pair's weighted count when it won.

    Scale shape — the classic dictionary trick makes this tractable at
    100 TB: training runs over the DISTINCT-WORD dictionary weighted
    by occurrence count (one corpus-sized explode + hash-agg, once),
    never the corpus itself; by Zipf the dictionary is orders of
    magnitude smaller and BOUNDED (``min_count`` trims the hapax
    tail).  Each round is then one map-side-combinable pair-count
    hash-agg over the dictionary + an argmax read as per-partition
    top-1 (ORDER BY ... LIMIT 1, no global sort), and the merge
    applies INCREMENTALLY — only words containing the winning pair
    re-fold, the rest carry by reference.  The driver holds one
    (a, b, n) row per round; lineage truncates EVERY round
    (localCheckpoint) because the incremental union references the
    previous state twice — without truncation the logical plan
    doubles per round (2^k by round k), the same lineage hazard the
    connected-components loop documents.  Ties break (count DESC,
    a ASC, b ASC) — deterministic across partitionings because the
    ordering is total.
    """
    spark = df.sparkSession
    words = (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("term")
        )
        .filter(F.col("term") != "")
    )
    dictionary = words.groupBy("term").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        dictionary = dictionary.filter(F.col("cnt") >= min_count)
    cur = dictionary.select(
        "cnt", _bpe_chars(F.col("term")).alias("syms")
    ).localCheckpoint(eager=True)
    # the per-round union doubles partition count (filter + filter);
    # coalesce back to the dictionary's own width each round or the
    # checkpointed state grows 2^k empty-ish partitions by round k
    n_parts = cur.rdd.getNumPartitions()
    merges: list[tuple] = []
    try:
        for r in range(n_merges):
            pairs = (
                cur.select(
                    "cnt",
                    F.explode(_bpe_pair_flags(F.col("syms"))).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
            )
            top = (
                pairs.orderBy(
                    F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(1)
                .collect()
            )
            if not top:
                break  # every word is a single symbol: nothing left
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((r + 1, a, b, a + b, n))
            hit = F.exists(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
                ),
                lambda t: t,
            )
            touched = cur.filter(hit).select(
                "cnt", _bpe_apply_merge(F.col("syms"), a, b).alias("syms")
            )
            nxt = cur.filter(~hit).unionByName(touched).coalesce(n_parts)
            prev = cur
            cur = nxt.localCheckpoint(eager=True)
            prev.unpersist()
    finally:
        cur.unpersist()
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("a", StringType()),
            StructField("b", StringType()),
            StructField("merged", StringType()),
            StructField("n", LongType()),
        ]
    )
    from ..session import local_rows

    return local_rows(spark, merges, schema)


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: DataFrame,
    oov_id: int = 0,
    merges_per_select: int = 16,
    checkpoint_every: int = 64,
) -> DataFrame:
    """Apply a trained merge table to a corpus — subword tokenization:
    ``(id, token_ids, n_tokens, n_oov)``, same surface as
    ``tokenize_docs`` (which accepts ``merges=`` and delegates here).

    Scale shape: merges apply to the DISTINCT-WORD dictionary (the
    same trick as training — each unique word encodes once, however
    often it occurs), chained ``merges_per_select`` folds per select
    with lineage truncation every ``checkpoint_every`` merges.  Token
    ids come from a frequency-ranked subword vocabulary over the
    encoded dictionary (count DESC, symbol ASC — deterministic), and
    documents rebuild positionally exactly like ``tokenize_docs``:
    posexplode -> broadcast-sized equi-join on the word -> per-doc
    sorted-struct flatten.  n_oov is always 0 here (BPE falls back to
    characters, which are all in-vocabulary) but kept for surface
    parity."""
    rules = [
        (r["a"], r["b"])
        for r in merges.orderBy("rank").collect()  # model metadata
    ]
    words = (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    dictionary = words.select("term").distinct()
    enc = dictionary.select(
        "term", _bpe_chars(F.col("term")).alias("syms")
    )
    col = F.col("syms")
    applied = 0
    for i, (a, b) in enumerate(rules):
        col = _bpe_apply_merge(col, a, b)
        applied += 1
        if applied == merges_per_select or i == len(rules) - 1:
            enc = enc.select("term", col.alias("syms"))
            col = F.col("syms")
            applied = 0
            if (i + 1) % checkpoint_every == 0:
                enc = enc.localCheckpoint(eager=True)
    # frequency-ranked subword ids over THIS corpus's usage
    usage = (
        words.join(enc, "term")
        .select(F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.count("*").alias("n_occurrences"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("sym").asc())
    vocab = usage.withColumn("token_id", F.row_number().over(w))
    sym_pos = words.join(enc, "term").select(
        id_col,
        "pos",
        F.posexplode("syms").alias("sub", "sym"),
    )
    ids = sym_pos.join(vocab.select("sym", "token_id"), "sym", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(int(oov_id))).cast("int")
    return ids.groupBy(id_col).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("pos"), F.col("sub"), tid.alias("tid"))
                )
            ),
            lambda s: s["tid"],
        ).alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long")).alias("n_oov"),
    )
