"""Text-analysis functions for large-scale training-data pipelines.

Not present in the reference (its payloads are already-structured
recommendation records); these extend the engine to the document-
processing operators a 100 TB data pipeline needs: tokenization,
quality scoring, language heuristics, and content fingerprinting.

All are pure Catalyst column expressions (built-in string/array/
higher-order functions — JVM-side, whole-stage codegen, zero Python
UDFs), so they scale linearly with executors and never serialize rows
to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function words for the stopword-ratio language heuristic. Deliberately
# tiny: the point is the operator shape (set-membership ratio over a
# token array), not linguistic accuracy.
ENGLISH_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")

# BPE-ish lexer: alpha runs | digit runs | any single non-space symbol.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens (split on non-alphanumeric runs,
    empties dropped)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def whitespace_token_count(text: Column) -> Column:
    """Naive whitespace token count."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda t: t != F.lit("")))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + single symbols."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0))


def total_token_chars(toks: Column) -> Column:
    """Sum of token lengths (integer fold — deterministic)."""
    return F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )


def stopword_hits(toks: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    """Number of tokens that are function words."""
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: token count, mean token length, and
    stopword ratio. Ratios are exact integer-division doubles so they
    reproduce bit-identically on any engine."""
    toks = tokens(text)
    n = F.size(toks).cast("bigint")
    total_chars = total_token_chars(toks)
    hits = stopword_hits(toks).cast("bigint")
    return {
        "n_tokens": n,
        "avg_token_len": F.when(n > 0, total_chars / n),
        "stopword_ratio": F.when(n > 0, hits / n),
        "is_english": F.when(n > 0, (hits / n) > 0.05).otherwise(F.lit(False)),
    }


def quality_filter_flags(
    text: Column,
    min_tokens: int = 10,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    min_stopword_ratio: float = 0.02,
    max_symbol_ratio: float = 0.10,
    max_digit_ratio: float = 0.30,
) -> dict[str, Column]:
    """C4/Gopher-style document quality rules as boolean flag columns
    plus the combined ``keep`` verdict. Each rule is a pure Catalyst
    expression (one pass over the text, integer-ratio arithmetic) so a
    100 TB corpus filter is a single projected scan — flags kept as
    columns rather than filtering eagerly, because real pipelines audit
    WHY documents were dropped (per-rule rejection rates)."""
    qf = quality_features(text)
    low = F.lower(text)
    n_chars = F.length(text).cast("bigint")
    symbols = F.length(F.regexp_replace(low, "[a-z0-9\\s]", "")).cast("bigint")
    digits = F.length(F.regexp_replace(low, "[^0-9]", "")).cast("bigint")
    nonzero = n_chars > 0
    flags = {
        "flag_too_short": qf["n_tokens"] < min_tokens,
        "flag_token_len": ~F.coalesce(
            qf["avg_token_len"].between(min_avg_token_len, max_avg_token_len),
            F.lit(False),
        ),
        "flag_low_stopword": F.coalesce(qf["stopword_ratio"], F.lit(0.0))
        < min_stopword_ratio,
        "flag_symbol_heavy": F.when(nonzero, symbols / n_chars).otherwise(0.0)
        > max_symbol_ratio,
        "flag_digit_heavy": F.when(nonzero, digits / n_chars).otherwise(0.0)
        > max_digit_ratio,
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & ~c
    return {**flags, "keep": keep, "n_tokens": qf["n_tokens"]}


def fingerprint_min_8gram(text: Column) -> Column:
    """Content fingerprint: the minimum md5 over all character 8-grams
    (winnowing-style rolling fingerprint, window = whole document).
    Robust to edits outside the minimizing window; two documents
    sharing their minimizing 8-gram collide — the building block for
    shingle-based near-dup bucketing."""
    n_windows = F.greatest(F.length(text) - F.lit(7), F.lit(1))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.md5(F.substring(text, i, 8)),
        )
    )


def term_frequencies(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, term, tf) — distinct-term explode with per-doc counts.
    One narrow shuffle keyed (id, term); map-side combine applies."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_term_len: int = 3,
):
    """Top-k characteristic terms per document by tf·idf.

    idf = ln(n_docs / df): document frequency via a second aggregate on
    the term key, joined back (broadcast — the vocabulary is orders of
    magnitude smaller than the corpus); ranking by one window on the
    doc key with (score desc, term asc) determinism. Short terms are
    dropped up front (stopword-ish noise, smaller shuffle).

    At 100 TB: tf table >> vocabulary; both aggregates are map-side
    combinable, and the join stays broadcast until the vocabulary
    itself is huge — then it's still an equi join on the term key.
    """
    from pyspark.sql.window import Window

    tf = term_frequencies(df, text_col, id_col).where(
        F.length("term") >= min_term_len
    )
    # n_docs as a broadcast 1-row frame keeps the whole plan lazy (no
    # driver-side collect action before the real one)
    n_docs = df.select(
        F.countDistinct(id_col).cast("double").alias("__n_docs")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("__n_docs") / F.col("df")))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "rank")
    )


def chunk_documents(
    df,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into overlapping token windows — the context-
    window packing step before tokenizer/training shards. One
    generator expression per doc (sequence of chunk starts → slice →
    posexplode), zero Python and zero joins: the fan-out is a narrow
    projection, so a 100 TB corpus chunks in a single scan.

    Chunks step by ``chunk_tokens - overlap``; the final window keeps
    its tail (shorter than ``chunk_tokens``) unless it would duplicate
    the previous window entirely (docs shorter than one chunk yield
    exactly one). Returns (id, chunk_no, n_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # 0-based start offsets: 0, step, 2*step, ... while start < n and
    # (start == 0 or start + overlap < n) — the second clause drops a
    # trailing window that would be a pure suffix of the previous one
    last_start = F.greatest(
        F.floor((n - F.lit(overlap) - 1) / F.lit(step)).cast("int"), F.lit(0)
    ) * step
    starts = F.sequence(F.lit(0), last_start, F.lit(step))
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s + 1, F.lit(chunk_tokens))
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(chunks).alias("chunk_no", "chunk_toks"),
        )
        .where(F.size("chunk_toks") > 0)
        .select(
            "id",
            F.col("chunk_no").cast("bigint").alias("chunk_no"),
            F.size("chunk_toks").cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", F.col("chunk_toks")).alias("chunk_text"),
        )
    )


def repetition_signals(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_unigram: float = 0.20,
    max_top_bigram: float = 0.18,
):
    """Gopher-style repetition quality signals: the fraction of a
    document covered by its most frequent unigram and bigram (template
    spam and keyword stuffing score high; natural text stays low).

    Shape at 100 TB: explode to (id, gram) then two map-side-
    combinable aggregates — count per (id, gram), then max/sum per id
    — never an O(distinct x n) per-row expression rescan. Documents
    with no tokens drop out (no grams to measure).

    Returns (id, n_tokens, top_unigram_frac, top_bigram_frac,
    flag_repetitive).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    uni = (
        base.select("id", F.explode("toks").alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.max("c").alias("max_uni"),
            F.sum("c").cast("bigint").alias("n_tokens"),
        )
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.get(F.col("toks"), i - 1), F.get(F.col("toks"), i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = (
        base.select("id", F.explode(bigrams).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.max("c").alias("max_big"),
            F.sum("c").cast("bigint").alias("n_bigrams"),
        )
    )
    out = uni.join(big, "id", "left").select(
        "id",
        "n_tokens",
        (F.col("max_uni") / F.col("n_tokens")).alias("top_unigram_frac"),
        (F.col("max_big") / F.col("n_bigrams")).alias("top_bigram_frac"),
    )
    return out.withColumn(
        "flag_repetitive",
        (F.col("top_unigram_frac") > max_top_unigram)
        | F.coalesce(F.col("top_bigram_frac") > max_top_bigram, F.lit(False)),
    )


def hash_split(
    df, weights: dict[str, float], id_col: str, salt: str = "split-v1"
):
    """Deterministic train/validation/test split: bucket by a salted
    64-bit hash of the id — stable across runs, machines, and
    repartitions (unlike randomSplit, which depends on partition
    layout). Returns {name: DataFrame}; weights must sum to 1.

    A row's assignment never changes when the dataset grows — the
    property that keeps eval sets leak-free across dataset versions.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)), F.lit(1_000_000))
    out = {}
    lo = 0.0
    for name, w in weights.items():
        hi = lo + w * 1_000_000
        cond = (bucket >= F.lit(int(lo))) & (bucket < F.lit(int(hi)))
        if name == list(weights)[-1]:
            cond = bucket >= F.lit(int(lo))  # absorb rounding residue
        out[name] = df.where(cond)
        lo = hi
    return out


# --- PII scrubbing ---------------------------------------------------------

# Deliberately simple, engine-portable patterns (valid Java regex AND
# RE2): the operator contract is "same spans in any engine", not
# maximal recall — production rule packs slot into the same shape.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}"


def scrub_pii(
    text: Column,
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> dict[str, Column]:
    """Mask email/phone spans in ``text`` and count what was masked.

    Pure Catalyst regexp expressions — per-row, no shuffle, runs
    inside the scan's codegen stage; at 100 TB this is a free map over
    the corpus. Emails are scrubbed before phones so the two counts
    partition the masked spans deterministically.

    Returns ``{"scrubbed", "n_emails", "n_phones"}`` columns.
    """
    n_emails = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(text, PII_EMAIL_RE, email_token)
    n_phones = F.size(
        F.regexp_extract_all(no_email, F.lit(PII_PHONE_RE), F.lit(0))
    )
    scrubbed = F.regexp_replace(no_email, PII_PHONE_RE, phone_token)
    return {
        "scrubbed": scrubbed,
        "n_emails": n_emails.cast("bigint"),
        "n_phones": n_phones.cast("bigint"),
    }


# --- sequence packing ------------------------------------------------------


def pack_sequences(
    df,
    order_cols,
    token_col: str = "n_tokens",
    capacity: int = 2048,
    bin_name: str = "bin_id",
):
    """Concatenative sequence packing for LLM pretraining: documents
    are laid end-to-end in ``order_cols`` order and cut into fixed
    ``capacity``-token context windows. Adds:

    - ``start_offset`` — the doc's global token offset, from the
      distributed prefix sum (``add_running_total``): range-partition
      + per-partition offsets, never a single-task global window;
    - ``bin_name`` — the context window the doc starts in
      (``start_offset // capacity``);
    - ``spans_boundary`` — docs crossing a cut point (the ones a
      loader splits or masks across windows).

    ``order_cols`` must be a unique ordering. Zero-token docs never
    span.
    """
    from amazon_personalize_connectors_spark.operators.ids import (
        add_running_total,
    )

    out = add_running_total(df, order_cols, token_col, total_name="__end")
    start = F.col("__end") - F.col(token_col)
    return (
        out.withColumn("start_offset", start.cast("bigint"))
        .withColumn(
            bin_name, F.floor(start / F.lit(capacity)).cast("bigint")
        )
        .withColumn(
            "spans_boundary",
            (F.col(token_col) > 0)
            & (
                F.floor(start / F.lit(capacity))
                != F.floor((F.col("__end") - 1) / F.lit(capacity))
            ),
        )
        .drop("__end")
    )


# --- data-mixture rebalancing ---------------------------------------------


def temperature_resample(
    df,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
):
    """Deterministic temperature (alpha = 0.5) down-sampling of
    over-represented groups — the multilingual/multi-source mixture
    rebalancing step of LLM corpus prep. Keep rate per group is
    ``sqrt(min_count / count_g)`` (the smallest group keeps 100%),
    membership decided by a salted md5 bucket of the id — stable
    under growth and repartitioning, like ``hash_split``.

    100 TB shape: ONE eager map-side-combinable aggregate collects the
    |groups|-row count table to the driver (the mixture contract is a
    low-cardinality group key — languages/sources; same pattern as the
    ids.py per-partition offsets), rates become a literal broadcast
    frame, and the keep decision is a pure per-row filter the scan
    evaluates — exactly one lazy pass over the corpus, no lineage
    re-scans. ``sqrt`` and float division are IEEE correctly-rounded,
    so rates (and membership) are engine-exact.

    Returns (df + ``keep_rate``, filtered to kept rows).
    """
    import math

    count_rows = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n")
    ).collect()
    min_n = min(r["__n"] for r in count_rows)
    group_type = dict(df.dtypes)[group_col]
    rates = F.broadcast(
        df.sparkSession.createDataFrame(
            [(r[group_col], math.sqrt(min_n / r["__n"])) for r in count_rows],
            f"`{group_col}` {group_type}, keep_rate double",
        )
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return df.join(rates, group_col).where(
        bucket < F.floor(F.col("keep_rate") * F.lit(2.0 ** 32))
    )


def doc_bigrams(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, w1, w2) — one row per adjacent token pair per document.

    One codegen projection: explode the 0..n-2 index sequence and pick
    both grams with flat array gets (the gram_table shape — no
    per-element HOF lambdas, no shuffle). Documents with fewer than
    two tokens produce no rows."""
    return (
        df.select(
            F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
        )
        .where(F.size("t") >= 2)
        .select(
            "id",
            "t",
            F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i"),
        )
        .select(
            "id",
            F.get("t", F.col("i")).alias("w1"),
            F.get("t", F.col("i") + 1).alias("w2"),
        )
    )


def lm_coverage(
    train,
    heldout,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Bigram-LM coverage scoring of held-out documents: build the LM
    (bigram -> count) from the training split, then score every
    held-out document by how much of it the LM has seen — the
    integer-exact stand-in for perplexity filtering (log-prob sums are
    engine-divergent doubles; hit counts and mass are not).

    Shape at 100 TB: the LM is a map-side-combinable aggregate keyed
    on (w1, w2); scoring is one hash equi-join on the same key (both
    sides shuffle-partitioned by bigram — no broadcast assumption, an
    LM over web-scale text is itself large) plus one per-doc
    aggregate. The two splits are separate frames (typically filters
    of one scan), so nothing ever joins on the row-scale doc id; at
    scale, materialize ``doc_bigrams`` to parquet first (the
    ngram_jaccard_materialized pattern) to scan the corpus once.

    Returns (id, n_bigrams, n_hits, hit_mass, coverage): total pairs,
    pairs known to the LM, summed LM counts of known pairs, and the
    known fraction (exact bigint/bigint -> double division).
    """
    lm = (
        doc_bigrams(train, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    held = doc_bigrams(heldout, text_col, id_col)
    joined = held.join(lm, ["w1", "w2"], "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("c12").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_hits"),
            F.sum(F.coalesce(F.col("c12"), F.lit(0))).cast("bigint").alias(
                "hit_mass"
            ),
        )
        .select(
            "id",
            "n_bigrams",
            "n_hits",
            "hit_mass",
            (F.col("n_hits") / F.col("n_bigrams")).alias("coverage"),
        )
    )


def bpe_pair_stats(df, text_col: str = "text", top_n: int = 20):
    """First BPE merge round: corpus-wide counts of adjacent character
    pairs inside tokens, top ``top_n`` by (count desc, pair asc) —
    the statistic a byte-pair tokenizer trainer computes to pick its
    next merge. Iterating = re-running over the re-paired symbol
    table; each round is this same one-aggregate shape.

    Plan: explode tokens, explode the 1..len-1 positions, slice each
    pair with substring — flat codegen projections into ONE map-side-
    combinable count aggregate; the global top-n sorts only the
    aggregated pair table (TakeOrderedAndProject, never row-scale).
    """
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).where(
        F.length("tok") >= 2
    )
    pairs = tok.select(
        "tok",
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
    ).select(F.substring(F.col("tok"), F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(top_n)
    )


def bm25_topk(
    df,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25 retrieval scoring: rank documents against a bag of query
    terms with the classic Robertson idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` and tf saturation /
    length normalization ``tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))``.

    Scale shape: the term-frequency table filters to the QUERY terms
    before anything else (rows ∝ docs x |query|, never the full
    vocabulary); doc lengths come from one map-side-combinable
    aggregate over the same tf table; N, avgdl, and the per-term dfs
    ride broadcast 1-row / |query|-row frames. The only shuffles are
    the tf build and the per-doc score sum. Scores are rounded to 6dp
    so cross-engine libm ulp noise cannot reorder the ranking, and
    ties break on doc id.
    """
    from pyspark.sql.window import Window

    tf_all = term_frequencies(df, text_col, id_col)
    doclen = tf_all.groupBy("id").agg(F.sum("tf").alias("dl"))
    corpus_stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("__avgdl"),
    )
    qtf = tf_all.where(F.col("term").isin(list(query_terms)))
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        qtf.join(F.broadcast(dfreq), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("__avgdl")
                )
            ),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.round(F.sum("_s"), 6).alias("score"),
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
    )
    # global top-k via orderBy+limit (TakeOrdered — per-partition heaps,
    # no single-task global window); the rank window then runs over k
    # rows only
    topk = per_doc.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    # k-row window; a constant-valued NON-FOLDABLE partition key
    # (id*0 — the optimizer strips a bare lit()) silences the
    # global-window warning without changing the single-partition plan
    w = Window.partitionBy(F.col("id") * 0).orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "id", "score", "n_terms_hit", F.col("rank").cast("int").alias("rank")
    )


def hashed_tfidf_features(
    df,
    n_dims: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_term_len: int = 3,
    tag: str = "feat-v1",
):
    """Hashing-trick document vectorizer: each term maps to a fixed
    dimension by a salted PORTABLE hash (md5-substring — the repo's
    engine-portable recipe, so the feature map itself is
    oracle-checkable), and dimension weights are tf * ln(N/df)
    summed over the colliding terms. Sparse long-form output
    (id, dim, weight): zero dims never materialize.

    This is the classical-ML feature path at corpus scale — fixed
    dimensionality regardless of vocabulary growth, no vocabulary
    dictionary to build, broadcast or shuffle. Weights round to 6dp
    so accumulation-order ulps stay out of the comparison.
    """
    tf = term_frequencies(df, text_col, id_col).where(
        F.length("term") >= min_term_len
    )
    n_docs = df.select(F.countDistinct(id_col).cast("double").alias("__n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dim = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col("term"), F.lit(tag))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_dims),
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("dim", dim)
        .groupBy("id", "dim")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.col("__n_docs") / F.col("df"))), 6
            ).alias("weight")
        )
    )


def skipgram_pairs(
    df,
    window: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(center, context) skip-gram pair counts with a symmetric token
    window — the training-pair extraction for word2vec-style embedding
    pipelines. Pure generator over each document's token array (for
    position i, contexts i+1..i+window; symmetric pairs come from
    emitting both orientations), so pair fan-out is tokens x 2·window
    with NO self-join on positions and no shuffle before the final
    count aggregate."""
    toks = tokens(F.col(text_col))
    fwd = F.flatten(
        F.transform(
            toks,
            lambda t, i: F.transform(
                F.slice(
                    toks,
                    (i + 2).cast("int"),
                    F.least(F.lit(window), F.size(toks) - i - 1).cast("int"),
                ),
                lambda c: F.struct(t.alias("center"), c.alias("context")),
            ),
        )
    )
    pairs = df.select(F.explode(fwd).alias("p")).select("p.center", "p.context")
    both = pairs.unionByName(
        pairs.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
    )
    return both.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def source_quality_report(
    df,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
):
    """Per-source corpus curation report — the keep/drop/downsample
    decision table a training-data pipeline builds before mixing
    sources: exact document/token/character totals, stopword rate,
    English share, and the cross-corpus duplicate rate (documents
    whose exact digest appears more than once ANYWHERE — a source
    full of copies of other sources scores high here).

    Exactness: every aggregate is an integer SUM (associative); the
    four rates are single divisions of exact totals at the very end.
    Scale shape: one scan computes per-doc integer signals, the
    corpus-wide digest counts are a groupBy on the 16-byte digest
    joined back (the dedup_exact shuffle), and the report is one
    map-side-combinable aggregate with rows ∝ sources."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("bigint")
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("_dig"),
        n_tok.alias("_nt"),
        total_token_chars(toks).alias("_tc"),
        stopword_hits(toks).cast("bigint").alias("_sh"),
        F.length(F.col(text_col)).cast("bigint").alias("_nc"),
    )
    dig_counts = per_doc.groupBy("_dig").agg(
        F.count(F.lit(1)).alias("_dn")
    )
    flagged = per_doc.join(dig_counts, "_dig").select(
        "source",
        "_nt",
        "_tc",
        "_sh",
        "_nc",
        (F.col("_dn") > 1).cast("long").alias("_dup"),
        # ANSI guard: a zero-token doc would make the ratio a
        # divide-by-zero error, not a NULL
        F.when(F.col("_nt") > 0, (F.col("_sh") / F.col("_nt")) > 0.05)
        .otherwise(F.lit(False))
        .cast("long")
        .alias("_eng"),
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_nt").cast("bigint").alias("n_tokens"),
        F.sum("_tc").cast("bigint").alias("n_token_chars"),
        F.sum("_sh").cast("bigint").alias("n_stopword_hits"),
        F.sum("_nc").cast("bigint").alias("n_chars"),
        F.sum("_dup").cast("bigint").alias("n_dup_docs"),
        F.sum("_eng").cast("bigint").alias("n_english_docs"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_dup_docs",
        "n_english_docs",
        (F.col("n_tokens") / F.col("n_docs")).alias("tokens_per_doc"),
        (F.col("n_stopword_hits") / F.col("n_tokens")).alias("stopword_rate"),
        (F.col("n_dup_docs") / F.col("n_docs")).alias("dup_rate"),
        (F.col("n_english_docs") / F.col("n_docs")).alias("english_share"),
    )


def bpe_learn_merges(
    df,
    text_col: str = "text",
    n_merges: int = 10,
    min_word_len: int = 2,
):
    """Train ``n_merges`` rounds of byte-pair-encoding merges over the
    corpus — the actual tokenizer-training loop, not just the round-1
    statistic (bpe_pair_stats is one iteration of this). Returns the
    learned merge TABLE (step, left, right, merged, pair_count): the
    artifact a BPE tokenizer ships.

    Representation: BPE trains on the word-frequency table, so the
    corpus first collapses to distinct words + counts (map-side
    combinable — the table is vocabulary-sized, orders of magnitude
    smaller than the corpus at any scale). Each word's symbol
    sequence is a chr(1)-separated STRING with leading/trailing
    separators; applying merge (x, y) is one literal replace of
    ``\\x01x\\x01y\\x01`` with ``\\x01xy\\x01`` — an operation with
    IDENTICAL left-to-right non-overlapping semantics in every engine
    (Spark `replace`, DuckDB `replace`, Java, C), which is what makes
    the whole training trace oracle-replayable.

    Merge semantics caveat (documented, deterministic): because a
    match consumes its trailing separator, an ODD-length run of the
    same symbol ("aaa" merging (a,a)) merges one pair per round
    instead of flooring len/2 pairs; the remainder merges next round
    if still the argmax. Real corpora are insensitive; degenerate
    run-heavy inputs learn the same vocabulary one round later.

    Per round, fully distributed: adjacent pairs explode from the
    split symbols into ONE count aggregate; the argmax pair (count
    desc, then lexicographically smallest — exact tie-break) comes
    from a max-count 1-row broadcast + struct-min; the word table is
    re-written by the replace and localCheckpoint'ed (bounded-loop
    pattern: mmr_rerank / graph_random_walks). The ONE-ROW argmax is
    collect()ed per round to parameterize the next round's literal
    replace — a bounded collect (n_merges rows total over the whole
    run), the documented-contract class of ids.py/text.py, never
    data-sized. ``n_merges`` is the product knob (GPT-2 uses 50k;
    tests use 5-10)."""
    sep = "\x01"
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.length("tok") >= min_word_len)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.concat(
                F.lit(sep),
                F.array_join(F.split(F.col("tok"), ""), sep),
                F.lit(sep),
            ).alias("w"),
            "cnt",
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for step in range(1, n_merges + 1):
        syms = F.filter(
            F.split(F.col("w"), sep), lambda s: s != F.lit("")
        )
        pairs = (
            words.select("cnt", syms.alias("s"))
            # guard: sequence(1, 0) counts DOWN in Spark, and a fully
            # merged single-symbol word has no adjacent pairs at all
            .where(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.sequence(F.lit(1), F.size("s") - 1)
                ).alias("i"),
                "s",
            )
            .select(
                F.element_at("s", F.col("i")).alias("x"),
                F.element_at("s", F.col("i") + 1).alias("y"),
                "cnt",
            )
            .groupBy("x", "y")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        mx = pairs.agg(F.max("c").alias("cmax"))
        best = (
            pairs.join(F.broadcast(mx), pairs["c"] == mx["cmax"])
            .agg(F.min(F.struct("x", "y", "c")).alias("b"))
            .select(
                F.lit(step).cast("bigint").alias("step"),
                F.col("b.x").alias("left"),
                F.col("b.y").alias("right"),
                F.concat(F.col("b.x"), F.col("b.y")).alias("merged"),
                F.col("b.c").alias("pair_count"),
            )
            .localCheckpoint(eager=True)
        )
        row = best.collect()
        if not row:  # corpus exhausted (all words single-symbol)
            break
        merges.append(best)
        r = row[0]
        words = words.select(
            F.replace(
                F.col("w"),
                F.lit(f"{sep}{r['left']}{sep}{r['right']}{sep}"),
                F.lit(f"{sep}{r['merged']}{sep}"),
            ).alias("w"),
            "cnt",
        ).localCheckpoint(eager=True)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def winnowing_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 8,
    window: int = 4,
):
    """TRUE winnowing (the MOSS plagiarism-detection scheme), not
    just the whole-document minimum that ``fingerprint_min_8gram``
    keeps: hash every character ``gram``-gram, then keep the MINIMUM
    hash of every ``window`` consecutive hashes. The guarantee that
    makes it the standard: any shared substring of at least
    gram + window − 1 characters contributes at least one IDENTICAL
    fingerprint to both documents — no near-miss probability like
    MinHash bands, while storing ~2/(window+1) of the grams.

    All engine-portable pieces (md5 hex min, substring, sequences),
    so the oracle computes the identical fingerprint sets. Row-local
    codegen: grams, window minima, and the distinct-set collapse all
    happen inside one projection per document; output explodes to
    (id, fp) — the inverted-index input for candidate pairing.

    Scale shape: fingerprints per doc ≈ 2·len/(window+1), and the
    downstream join must block on fingerprint frequency (common
    English 8-grams fingerprint half the corpus — the rare-shingle
    rule from minhash_lsh_candidates applies verbatim)."""
    hs = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(F.col(text_col)) - F.lit(gram - 1), F.lit(1)),
        ),
        lambda i: F.md5(F.substring(F.col(text_col), i, gram)),
    )
    # materialize the gram-hash array as its OWN column first:
    # Catalyst performs no common-subexpression elimination inside
    # higher-order lambdas, so composing `fps` directly over the `hs`
    # EXPRESSION re-hashes the whole document once per window —
    # O(len²) md5 calls (measured 130 s where 2 s is right). A named
    # column is a cheap bound reference inside the lambda, and
    # CollapseProject leaves it alone (non-cheap producer used more
    # than once).
    with_hs = df.select(F.col(id_col).alias("id"), hs.alias("_hs"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("_hs") - F.lit(window - 1), F.lit(1)),
            ),
            lambda j: F.array_min(F.slice(F.col("_hs"), j, window)),
        )
    )
    return with_hs.select("id", F.explode(fps).alias("fp"))


def winnowing_candidates(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 8,
    window: int = 4,
    max_fp_freq: int = 50,
    min_shared: int = 2,
):
    """Near-dup candidate pairs from winnowed fingerprints: inverted
    index on the fingerprint, RARE fingerprints only (frequency ≤
    ``max_fp_freq`` — the blocking contract that keeps the bucket
    join linear; a fingerprint shared by half the corpus carries no
    discriminative signal anyway), pairs sharing ≥ ``min_shared``.
    Output (id_a, id_b, n_shared)."""
    fps = winnowing_fingerprints(df, id_col, text_col, gram, window)
    # rare-fingerprint blocking as a WINDOW count over the fp
    # partition rather than a groupBy + self-join (r13, guide §2.4):
    # the old rare-set branch was a third full evaluation of the
    # per-document gram hashing (Catalyst duplicates the fps subtree
    # per consumer), plus its own exchange; the window form computes
    # the frequency on the SAME single exchange the pair join needs,
    # so the document text is hashed once and both join sides read
    # the one shuffled fingerprint table (ReusedExchange). Counts are
    # identical: fps rows are distinct per (id, fp), so the partition
    # count IS the document frequency."""
    from pyspark.sql import Window as _W

    filtered = (
        fps.withColumn("_c", F.count(F.lit(1)).over(_W.partitionBy("fp")))
        .where(F.col("_c") <= max_fp_freq)
        .drop("_c")
    )
    a = filtered.select("fp", F.col("id").alias("id_a"))
    b = filtered.select("fp", F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def bpe_encode_vocab_counts(
    df,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    min_word_len: int = 2,
):
    """ENCODE side of the BPE tokenizer: apply an ordered list of
    learned merges (bpe_learn_merges output) to the corpus and return
    the resulting symbol vocabulary histogram (symbol, n_words_with,
    total_occurrences) — what a tokenizer-build pipeline inspects
    before shipping the vocab.

    Application is the same chr(1)-delimited literal replace the
    trainer used (identical semantics on every engine), folded over
    the merge list IN ORDER — merge order is the BPE contract, later
    merges build on earlier ones. The merge list is a driver-side
    product artifact (n_merges entries, bounded), so the fold is
    plan construction, not per-row Python; the whole encode is one
    codegen projection chain over the vocabulary-sized word table,
    then one explode + count aggregate."""
    sep = "\x01"
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.length("tok") >= min_word_len)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.concat(
                F.lit(sep),
                F.array_join(F.split(F.col("tok"), ""), sep),
                F.lit(sep),
            ).alias("w"),
            "cnt",
        )
    )
    col = F.col("w")
    for left, right in merges:
        col = F.replace(
            col,
            F.lit(f"{sep}{left}{sep}{right}{sep}"),
            F.lit(f"{sep}{left}{right}{sep}"),
        )
    encoded = words.select(col.alias("w"), "cnt")
    syms = F.filter(F.split(F.col("w"), sep), lambda s: s != F.lit(""))
    return (
        encoded.select(F.explode(syms).alias("symbol"), "cnt")
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words_with"),
            F.sum("cnt").cast("bigint").alias("total_occurrences"),
        )
    )


def token_pmi(
    df,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    scale: int = 1_000_000_000,
):
    """Top collocations by pointwise mutual information over adjacent
    token pairs — the classic phrase-mining pass (word2vec-style
    phrase joining, vocabulary curation) a pretraining corpus
    pipeline runs before tokenizer training.

        pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )
                 = ln( c_ab·N·N / (N_b·c_a·c_b) )

    with c_ab adjacent-pair counts over N_b pair instances and
    c_a/c_b unigram counts over N token instances.

    Exactness contract (the ``mutual_information`` quantization
    pattern): all counts exact bigints; the log ARGUMENT is a ratio
    of exact decimal(38,0) cross-products cast to double once; the
    emitted ``pmi_q = floor(pmi·scale)`` is a bigint so the oracle
    compare is exact. (decimal(38,0) bounds the corpus at ~1e12
    token instances for the c_ab·N² product — pre-aggregate or
    sample vocabularies beyond that.)

    Scale shape: two map-side-combinable groupBys (pairs, unigrams),
    two equi-joins of the PAIR VOCABULARY (distinct pairs, not
    instances) against the unigram vocabulary, and a distributed
    take-ordered for the top-k (``orderBy().limit()`` is a per-
    partition top-k + driver merge of k·P rows — never a global
    sort). min_count prunes the pair vocabulary BEFORE the joins.
    """
    d = "decimal(38,0)"
    pairs = doc_bigrams(df, text_col=text_col)
    cb = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    )
    nb = cb.agg(F.sum("c_ab").cast("bigint").alias("n_b"))
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = uni.agg(F.sum("c").cast("bigint").alias("n_tok"))
    j = (
        cb.where(F.col("c_ab") >= min_count)
        .join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(n))
    )
    num = (
        (F.col("c_ab").cast(d) * F.col("n_tok").cast(d)).cast(d)
        * F.col("n_tok").cast(d)
    ).cast(d)
    den = (
        (F.col("n_b").cast(d) * F.col("c_a").cast(d)).cast(d)
        * F.col("c_b").cast(d)
    ).cast(d)
    pmi_q = F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(float(scale))
    ).cast("bigint")
    return (
        j.select(
            "w1",
            "w2",
            "c_ab",
            pmi_q.alias("pmi_q"),
            (pmi_q.cast("double") / F.lit(float(scale))).alias("pmi"),
        )
        .orderBy(F.col("pmi_q").desc(), "w1", "w2")
        .limit(top_k)
    )


def doc_entropy(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000_000,
):
    """Per-document unigram token entropy (nats) — the low-entropy
    detector for template spam, keyword stuffing, and boilerplate
    (near-zero entropy) that complements ``repetition_signals``
    (which only sees the TOP gram; entropy sees the whole
    distribution).

        H(doc) = Σ_t (c_t/n) · ln(n/c_t)

    Exactness: per-term contributions are quantized
    ``floor(term·scale)`` and summed as exact bigints (the
    ``mutual_information`` pattern), so the result is
    order-independent and oracle-exact; ``entropy = H_q/scale``.

    Scale shape: one map-side-combinable groupBy to the (doc, term)
    grid; the per-doc total rides as a window sum OVER THE GRID
    (grid-sized, never a second corpus pass); one final per-doc
    aggregate. Documents with zero tokens produce no rows."""
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("id")
    g = tf.withColumn("n", F.sum("c").over(w).cast("bigint"))
    term_q = F.floor(
        (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.lit(float(scale))
    ).cast("bigint")
    return g.select("id", "n", term_q.alias("q")).groupBy("id", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_tokens"),
        F.sum("q").cast("bigint").alias("h_q"),
    ).select(
        F.col("id").alias(id_col),
        F.col("n").alias("n_tokens"),
        "distinct_tokens",
        "h_q",
        (F.col("h_q").cast("double") / F.lit(float(scale))).alias("entropy"),
    )


def zipf_alpha(
    df,
    text_col: str = "text",
    group_col: str = "lang",
    max_rank: int = 500,
    scale: int = 1_000_000_000,
):
    """Zipf exponent per corpus slice: OLS slope of ln(frequency) on
    ln(rank) over the top ``max_rank`` terms — natural language sits
    near alpha ~= 1; machine-generated or templated slices drift, so
    the per-(lang/source) alpha is a cheap corpus-health audit
    (Zipf 1949; used as a quality signal in corpus curation).

    Exactness: ln(rank) and ln(freq) are quantized to bigint
    micro-units per TERM (deterministic scalar floor), the OLS
    moment sums run in exact decimal(38,0) (Σxy at rank 500 already
    exceeds int64 in quanta²), and the final slope is a ratio of two
    exact moments cast to double once:

        alpha = -(n·Σxy − Σx·Σy) / (n·Σxx − Σx²)

    Scale shape: one map-side-combinable groupBy to the
    (group, term) grid; per-group rank via row_number over the grid
    (domain-sized); the kept rows are ≤ max_rank per group, so the
    moment aggregate is bounded regardless of corpus size."""
    from pyspark.sql import Window

    d = "decimal(38,0)"
    counts = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    ranked = counts.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.col("f").desc(), "term")
        ),
    ).where(F.col("r") <= max_rank)
    x_q = F.floor(F.log(F.col("r").cast("double")) * F.lit(float(scale))).cast(d)
    y_q = F.floor(F.log(F.col("f").cast("double")) * F.lit(float(scale))).cast(d)
    m = ranked.select("grp", x_q.alias("x"), y_q.alias("y")).groupBy("grp").agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum("x").cast(d).alias("sx"),
        F.sum("y").cast(d).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d)).cast(d).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d)).cast(d).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d)
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d)
    return m.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("bigint").alias("n_ranked"),
        F.when(
            den.cast("double") != 0.0,
            -(num.cast("double") / den.cast("double")),
        ).alias("alpha"),
    )


def bigram_perplexity(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000_000,
):
    """Per-document perplexity under an add-one-smoothed bigram LM
    trained on the corpus itself — the perplexity-filtering pass
    (CCNet/RefinedWeb style) that flags documents whose local token
    transitions are improbable under the corpus distribution, without
    any external model artifact:

        P(w2|w1)  = (c(w1,w2) + 1) / (c(w1·) + V)
        H(doc)    = (1/m) Σ_pairs ln( (c(w1·)+V) / (c(w1,w2)+1) )
        ppl(doc)  = exp(H)

    Exactness: counts and V are exact bigints; each pair term's log
    argument is a ratio of two bigints cast to double once (both
    < 2^53 — no widening bridge needed); per-pair terms are
    quantized ``floor(term·scale)`` and summed as bigints, so H is
    order-independent and oracle-exact; ppl is a deterministic
    scalar ``exp`` of the same double in both engines.

    Scale shape: the model IS two map-side-combinable groupBys over
    the pair instances (pair counts, left-context counts) plus a
    1-row broadcast vocabulary size; scoring joins the pair
    INSTANCES against the pair vocabulary (equi-join on (w1,w2),
    then w1) and aggregates per doc. No Python, no windows over
    fact-sized data."""
    pairs = doc_bigrams(df, text_col=text_col, id_col=id_col)
    cb = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    cu = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .agg(F.count_distinct("term").cast("bigint").alias("v"))
    )
    scored = (
        pairs.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    term_q = F.floor(
        F.log(
            (F.col("c1") + F.col("v")).cast("double")
            / (F.col("c12") + F.lit(1)).cast("double")
        )
        * F.lit(float(scale))
    ).cast("bigint")
    per_doc = scored.select(F.col("id"), term_q.alias("q")).groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("q").cast("bigint").alias("h_q"),
    )
    ce = F.col("h_q").cast("double") / (
        F.col("n_bigrams").cast("double") * F.lit(float(scale))
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "h_q",
        ce.alias("cross_entropy"),
        F.exp(ce).alias("ppl"),
    )
