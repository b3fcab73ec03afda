"""Query registry, batch 2 — wider SURVEY.md §2 coverage.

Same contract as :mod:`bitextor_spark.queries` (imported from there and
registered into the same QUERIES/ORACLES dicts): each operator is an
idiomatic-Spark plan paired with a DuckDB ANSI-SQL twin where the
semantics are SQL-expressible, rows-only otherwise.

Covered here:
  A5  sort-based best-per-group dedup + URL collection
      (bitextor_build_TMX.py:222-344, keys Snakefile:1824-1831)
  W2  grouped re-rank via applyInPandas (bitextor_rank.py:22-79)
  C13 link extraction regexes + resolution (crawler-beans.cxml:289-333;
      href/src regexes as bitextor_url_set_overlap.py:31-34)
  C7  scope decide-rule chain (crawler-beans.cxml:131-186) via plans/scope
  J4/A4 dictionary translation join + bag-of-words overlap score
      (bitextor_idx2ridx.py:81-127,196-203)
  F15 ISO-639 lang normalization lookup (bitextor_prevertical_lang_iso639_1.py)
  S8/A6 corpus stats (Snakefile:1704-1712)
  P5/P6 trash-segment filter + prune (bitextor_split.py:34-52)
  F4  deferred per-segment hashes joined with '+'
      (bitextor_align_segments.py:116-126, Snakefile:228-229)
  O4  size-balanced re-batching (bitextor_split_segalign.py:21-54)
  T5  set difference — unpaired docs (bitextor_align_documents.py:337)
  ANN label vote (kNN classify over the embedding column)
  Multimodal: image decode / feature-extract / resize as Arrow-batched
      pandas UDF pipelines (rows-only; oracle = pure-Python recompute
      in tests/test_images.py)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from bitextor_spark.functions.hashes import h64, h64_sql
from bitextor_spark.functions.text import EN_STOPWORDS, token_count, tokens
from bitextor_spark.queries import T, q
from bitextor_spark.queries import _sql_tokens, _simhash_pairs_sql, _COS_SQL

# =========================================================================
# A5 — sort-based best-per-group dedup with group collection
# =========================================================================

@q(
    "a5_dedup_best_group",
    """
    WITH f AS (
      SELECT doc_id, n_chars,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp
      FROM documents),
    r AS (SELECT doc_id, n_chars, fp,
                 row_number() OVER (PARTITION BY fp
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM f),
    g AS (SELECT fp, count(*) AS n_dupes,
                 array_to_string(list_sort(list(doc_id)), ':') AS doc_list
          FROM f GROUP BY fp)
    SELECT r.fp, r.doc_id AS best_doc, r.n_chars AS best_chars,
           g.n_dupes, g.doc_list
    FROM r JOIN g USING (fp) WHERE rn = 1
    """,
)
def a5_dedup_best_group(spark, sf_dir):
    from bitextor_spark.functions.text import normalized_text

    f = T(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.md5(normalized_text(F.col("text"))).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy(F.col("n_chars").desc(), "doc_id")
    best = (
        f.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("fp", F.col("doc_id").alias("best_doc"),
                F.col("n_chars").alias("best_chars"))
    )
    groups = f.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_dupes"),
        F.concat_ws(
            ":",
            F.transform(F.sort_array(F.collect_list("doc_id")),
                        lambda d: d.cast("string")),
        ).alias("doc_list"),
    )
    return best.join(groups, "fp").select(
        "fp", "best_doc", "best_chars", "n_dupes", "doc_list"
    )


# =========================================================================
# W2 — grouped-map re-rank (applyInPandas), logistic scorer
# =========================================================================

def _w2_oracle_sql() -> str | None:
    """Replay the DEFAULT rerank artifact's learned weights in SQL: the
    committed artifact is a trained linear-logistic pickle, so the oracle
    is sigmoid(w0*z + w1*tok + b) with the pickle's exact coefficients.

    Returns ``None`` (→ rows-only registration) when the configured model
    is not linear-replayable — $BITEXTOR_SPARK_RERANK_MODEL accepts ANY
    pickled predict_proba model (e.g. a real SVM), and an opaque model must
    degrade this one query to a rows-only check, not crash the whole
    registry import. Load/unpickle failures degrade the same way; the
    query itself re-raises at call time with the real error."""
    from bitextor_spark.models import linear_rerank_params, load_rerank_model

    try:
        params = linear_rerank_params(load_rerank_model())
    except Exception:
        return None
    if params is None:
        return None
    w0, w1, b = params
    return f"""
    WITH d AS (SELECT doc_id, source, n_chars,
                      CAST(len({_sql_tokens('text')}) AS BIGINT) AS n_tok
               FROM documents),
    m AS (SELECT source, avg(n_chars) AS mu FROM d GROUP BY source),
    s AS (SELECT doc_id, d.source,
                 round(1.0 / (1.0 + exp(-({w0!r} * (n_chars - mu) / 1000.0
                                          + {w1!r} * n_tok / 100.0
                                          + {b!r}))), 4) AS score
          FROM d JOIN m USING (source))
    SELECT doc_id, source, score, rnk FROM (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rnk
      FROM s)
    WHERE rnk <= 5
    """


@q("w2_rerank_groups", _w2_oracle_sql())
def w2_rerank_groups(spark, sf_dir):
    """Per-group model re-rank: the SVM predict_proba → sort → threshold
    shape of bitextor_rank.py:22-79. The model is a pluggable artifact
    (models.load_rerank_model — sklearn predict_proba API); the committed
    default is the TRAINED logistic pickle from tools/train_rerank.py,
    whose learned weights the oracle replays. Grouped-map pandas UDF
    (Arrow batches)."""
    from bitextor_spark.models import load_rerank_model, rerank_scores

    model = load_rerank_model()
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", token_count(F.col("text")).alias("n_tok")
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        X = np.column_stack(
            [(pdf["n_chars"] - mu) / 1000.0, pdf["n_tok"] / 100.0]
        )
        score = pd.Series(rerank_scores(model, X), index=pdf.index)
        out = pdf.assign(score=score.round(4)).sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out.loc[out["rnk"] <= 5, ["doc_id", "source", "score", "rnk"]]

    return d.groupBy("source").applyInPandas(
        rerank, "doc_id long, source string, score double, rnk int"
    )


# =========================================================================
# C13 — link extraction + resolution over synthesized HTML
# =========================================================================

_HTML_SQL = (
    "'<html><body><a href=\"/doc/' || (doc_id + 1) || '\">n</a> '"
    " || '<a HREF=\"HTTP://WWW.' || upper(source) || '.EXAMPLE.COM/doc/'"
    " || (doc_id + 2) || '\">m</a> '"
    " || '<img src=\"/img/' || doc_id || '.png\"> '"
    " || '<a href=\"mailto:x@y\">mail</a></body></html>'"
)

_HREF_RE = '(?i)href="([^"]+)"'
_IMGSRC_RE = '(?i)<img[^>]*src="([^"]+)"'


@q(
    "c13_link_extract",
    f"""
    WITH h AS (SELECT doc_id, source, {_HTML_SQL} AS html FROM documents),
    raw AS (
      SELECT doc_id, source, 'href' AS kind,
             unnest(regexp_extract_all(html, '{_HREF_RE}', 1)) AS link
      FROM h
      UNION ALL
      SELECT doc_id, source, 'img' AS kind,
             unnest(regexp_extract_all(html, '{_IMGSRC_RE}', 1)) AS link
      FROM h)
    SELECT doc_id, kind,
           CASE WHEN link LIKE '/%'
                THEN 'http://' || source || '.example.com' || link
                ELSE replace(lower(link), '//www.', '//') END AS link_abs
    FROM raw
    WHERE lower(link) NOT LIKE 'mailto:%'
    """,
)
def c13_link_extract(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><a href="/doc/'),
        (F.col("doc_id") + 1).cast("string"),
        F.lit('">n</a> <a HREF="HTTP://WWW.'),
        F.upper("source"),
        F.lit(".EXAMPLE.COM/doc/"),
        (F.col("doc_id") + 2).cast("string"),
        F.lit('">m</a> <img src="/img/'),
        F.col("doc_id").cast("string"),
        F.lit('.png"> <a href="mailto:x@y">mail</a></body></html>'),
    )
    h = docs.select("doc_id", "source", html.alias("html"))
    hrefs = h.select(
        "doc_id", "source", F.lit("href").alias("kind"),
        F.explode(F.regexp_extract_all("html", F.lit(_HREF_RE), F.lit(1))).alias("link"),
    )
    imgs = h.select(
        "doc_id", "source", F.lit("img").alias("kind"),
        F.explode(F.regexp_extract_all("html", F.lit(_IMGSRC_RE), F.lit(1))).alias("link"),
    )
    raw = hrefs.unionByName(imgs).filter(
        ~F.lower(F.col("link")).startswith("mailto:")
    )
    link_abs = F.when(
        F.col("link").startswith("/"),
        F.concat(F.lit("http://"), F.col("source"),
                 F.lit(".example.com"), F.col("link")),
    ).otherwise(F.replace(F.lower(F.col("link")), F.lit("//www."), F.lit("//")))
    return raw.select("doc_id", "kind", link_abs.alias("link_abs"))


# =========================================================================
# C7 — scope decide-rule chain over a synthesized URL universe
# =========================================================================

@q(
    "c7_scope_decisions",
    """
    WITH u AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 'spam.facebook.com'
                  ELSE source || '.example.com' END AS host,
             CASE WHEN doc_id % 6 = 0 THEN '/x/y/z'
                  WHEN doc_id % 6 = 1 THEN '/r/r/r/r'
                  WHEN doc_id % 6 = 3 THEN '/files/arch.zip'
                  WHEN doc_id % 6 = 4 THEN '/robots.txt'
                  WHEN doc_id % 6 = 5 THEN '/img/banner.png'
                  ELSE '/' || array_to_string(
                        ['p' || i for i in generate_series(1, 25)], '/')
             END AS path,
             CAST(doc_id % 25 AS INT) AS hop
      FROM documents),
    t AS (
      SELECT u.*,
             CASE WHEN path LIKE '%.png'
                  THEN CAST(doc_id % 4 AS INT) ELSE 0 END AS trans_hops
      FROM u),
    a AS (
      SELECT doc_id, host, path, hop, trans_hops,
             len(list_filter(string_split(path, '/'), x -> x <> '')) AS depth,
             CASE WHEN len(list_distinct(list_filter(string_split(path, '/'),
                                                     x -> x <> ''))) = 1
                       AND len(list_filter(string_split(path, '/'),
                                           x -> x <> '')) > 1
                  THEN len(list_filter(string_split(path, '/'), x -> x <> ''))
                  ELSE 1 END AS max_run
      FROM t)
    SELECT doc_id, 'http://' || host || path AS url_canon, hop, trans_hops,
           (path = '/robots.txt'
            OR (NOT (depth > 20 OR max_run > 2
                     OR regexp_matches(host,
                'wordpress|blogspot|facebook|google|wikipedia|youtube|perehodi|twitter|instagram')
                     OR regexp_matches('http://' || host || path,
                        '\\.(?:exe|zip|rar|iso|dmg|tgz|tar)$')
                     OR (host = 'src0.example.com' AND path LIKE '/x%'))
                AND (trans_hops BETWEEN 1 AND 2
                     OR (host LIKE '%.example.com' AND hop <= 20))))
             AS in_scope
    FROM a
    """,
)
def c7_scope_decisions(spark, sf_dir):
    """Drives the real scope-rule chain (plans/scope.apply_scope): hop
    limit, blacklist, seed-domain acceptance, path depth, pathological
    repeats, robots disallow prefixes, custom regex reject, transclusion
    accept, prerequisite accept — over a URL universe crafted to exercise
    every rule (crawler-beans.cxml:131-186)."""
    from bitextor_spark.config import CrawlConfig
    from bitextor_spark.functions.urls import registered_domain_udf
    from bitextor_spark.plans.scope import apply_scope

    docs = T(spark, sf_dir, "documents")
    host = F.when(F.col("doc_id") % 7 == 0, F.lit("spam.facebook.com")).otherwise(
        F.concat(F.col("source"), F.lit(".example.com"))
    )
    deep = F.concat(
        F.lit("/"),
        F.concat_ws(
            "/",
            F.transform(
                F.sequence(F.lit(1), F.lit(25)),
                lambda i: F.concat(F.lit("p"), i.cast("string")),
            ),
        ),
    )
    path = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("/x/y/z"))
        .when(F.col("doc_id") % 6 == 1, F.lit("/r/r/r/r"))
        .when(F.col("doc_id") % 6 == 3, F.lit("/files/arch.zip"))
        .when(F.col("doc_id") % 6 == 4, F.lit("/robots.txt"))
        .when(F.col("doc_id") % 6 == 5, F.lit("/img/banner.png"))
        .otherwise(deep)
    )
    cand = docs.select(
        "doc_id",
        host.alias("host"),
        path.alias("_path"),
        F.concat(F.lit("http://"), host, path).alias("url_canon"),
        (F.col("doc_id") % 25).cast("int").alias("hop"),
    ).withColumn(
        "trans_hops",
        F.when(
            F.col("_path").endswith(".png"), (F.col("doc_id") % 4).cast("int")
        ).otherwise(F.lit(0)),
    ).drop("_path").withColumn("reg_domain", registered_domain_udf("host"))
    seed_domains = spark.createDataFrame(
        [("example.com",)], "reg_domain string"
    )
    robots = spark.createDataFrame(
        [("src0.example.com", 0, ["/x"])],
        "host string, crawl_delay_s int, disallow_prefixes array<string>",
    )
    return apply_scope(cand, seed_domains, robots, CrawlConfig()).select(
        "doc_id", "url_canon", "hop", "trans_hops", "in_scope"
    )


# =========================================================================
# J4/A4 — dictionary translation join + bag-of-words overlap score
# =========================================================================

_LEX_SQL = "(VALUES " + ", ".join(f"('{w}')" for w in EN_STOPWORDS) + ") lex(w)"


@q(
    "j4_dict_overlap",
    f"""
    WITH v AS (SELECT doc_id, source,
                      list_distinct(list_transform({_sql_tokens('text')},
                                                   x -> lower(x))) AS vocab
               FROM documents),
    tr AS (
      SELECT doc_id, list(DISTINCT w) AS translated
      FROM (SELECT v.doc_id, lex.w
            FROM v, {_LEX_SQL}
            WHERE list_contains(v.vocab, lex.w))
      GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(ta.translated) AS BIGINT) AS n_translated,
           round((CAST(least(len(a.vocab), len(b.vocab)) AS DOUBLE)
                  / greatest(len(a.vocab), len(b.vocab)))
                 * (CAST(len(list_intersect(ta.translated, b.vocab)) AS DOUBLE)
                    / len(ta.translated)), 4) AS overlap_score
    FROM v a JOIN v b ON a.source = b.source AND b.doc_id = a.doc_id + 20
             JOIN tr ta ON ta.doc_id = a.doc_id
    """,
)
def j4_dict_overlap(spark, sf_dir):
    """Broadcast dictionary join (J4) feeding the bag-of-words overlap
    score (A4): (min_vocab/max_vocab) * (|translated_a ∩ vocab_b| /
    n_translated). The lexicon is the identical-words extension (T3)."""
    docs = T(spark, sf_dir, "documents")
    v = docs.select(
        "doc_id", "source",
        F.array_distinct(F.transform(tokens(F.col("text")), F.lower)).alias("vocab"),
    )
    lex = spark.createDataFrame([(w,) for w in EN_STOPWORDS], "w string")
    tr = (
        v.select("doc_id", F.explode("vocab").alias("w"))
        .join(F.broadcast(lex), "w")
        .groupBy("doc_id")
        .agg(F.collect_set("w").alias("translated"))
    )
    a = v.alias("a")
    b = v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("b.doc_id") == F.col("a.doc_id") + 20),
    ).join(tr.withColumnRenamed("doc_id", "a_id"),
           F.col("a_id") == F.col("a.doc_id"))
    score = (
        F.least(F.size("a.vocab"), F.size("b.vocab")).cast("double")
        / F.greatest(F.size("a.vocab"), F.size("b.vocab"))
    ) * (
        F.size(F.array_intersect("translated", "b.vocab")).cast("double")
        / F.size("translated")
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.size("translated").cast("bigint").alias("n_translated"),
        F.round(score, 4).alias("overlap_score"),
    )


# (F15 lang-code normalization folded into s5_prevertical_parse in
# queries_batch3 — the reference runs them as ONE operator,
# bitextor_prevertical_lang_iso639_1.py: parse + ISO-639 lookup.)

# =========================================================================
# S8/A6 — corpus stats sink
# =========================================================================

@q(
    "s8_corpus_stats",
    f"""
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(len({_sql_tokens('text')})) AS BIGINT) AS n_words,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents GROUP BY source, lang
    """,
)
def s8_corpus_stats(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


# =========================================================================
# P5 — trash filter (punct/digit density, NUL) over segments
# =========================================================================

@q(
    "p5_trash_filter",
    """
    SELECT doc_id,
           round(CAST(len(regexp_extract_all(lower(text), '[^a-z\\s]')) AS DOUBLE)
                 / len(text), 4) AS junk_ratio
    FROM documents
    WHERE CAST(len(regexp_extract_all(lower(text), '[^a-z\\s]')) AS DOUBLE)
          / len(text) < 0.5
      AND strpos(text, chr(0)) = 0
    """,
)
def p5_trash_filter(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    junk = (
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[^a-z\s]")).cast("double")
        / F.length("text")
    )
    return (
        docs.filter((junk < 0.5) & (F.locate("\x00", F.col("text")) == 0))
        .select("doc_id", F.round(junk, 4).alias("junk_ratio"))
    )


# =========================================================================
# Segment split + prune + per-segment hash (bitextor_split semantics; the
# synthetic corpus has no sentence punctuation, so the delimiter token
# 'merge' plays the terminator role — identical split/explode/prune/hash
# dataflow).
# =========================================================================

_SEG_SPLIT = r"\bmerge\b\s*"


@q(
    "split_segments",
    f"""
    WITH s AS (SELECT doc_id,
                      list_filter(list_transform(
                          string_split_regex(text, '{_SEG_SPLIT}'),
                          x -> trim(x)), x -> x <> '') AS segs
               FROM documents)
    SELECT doc_id, CAST(e.i AS INT) AS seg_idx, e.seg AS segment,
           CAST(len({_sql_tokens('e.seg')}) AS BIGINT) AS n_words,
           {h64_sql('e.seg')} AS seg_hash
    FROM (SELECT doc_id,
                 unnest([{{'i': i, 'seg': segs[i]}}
                         for i in generate_series(1, len(segs))]) AS e
          FROM s)
    WHERE len({_sql_tokens('e.seg')}) <= 40
    """,
)
def split_segments(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    segs = F.filter(
        F.transform(F.split(F.col("text"), _SEG_SPLIT), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    ex = docs.select("doc_id", F.posexplode(segs).alias("pos", "segment"))
    return (
        ex.select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("seg_idx"),
            "segment",
            token_count(F.col("segment")).alias("n_words"),
            h64(F.col("segment")).alias("seg_hash"),
        )
        .filter(F.col("n_words") <= 40)
    )


@q(
    "f4_deferred_hash",
    f"""
    WITH s AS (SELECT doc_id,
                      list_filter(list_transform(
                          string_split_regex(text, '{_SEG_SPLIT}'),
                          x -> trim(x)), x -> x <> '') AS segs
               FROM documents)
    SELECT doc_id,
           array_to_string(list_transform(segs,
               x -> CAST({h64_sql('x')} AS VARCHAR)), '+') AS doc_hash
    FROM s
    """,
)
def f4_deferred_hash(spark, sf_dir):
    """Deferred-crawling document hash: '+'-joined per-segment hashes
    (mmhsum semantics, Snakefile:228-229)."""
    docs = T(spark, sf_dir, "documents")
    segs = F.filter(
        F.transform(F.split(F.col("text"), _SEG_SPLIT), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return docs.select(
        "doc_id",
        F.concat_ws("+", F.transform(segs, lambda x: h64(x).cast("string"))).alias(
            "doc_hash"
        ),
    )


# =========================================================================
# O4 — size-balanced re-batching (ntile over a size ordering)
# =========================================================================

@q(
    "o4_range_batching",
    """
    WITH b AS (SELECT doc_id, n_chars,
                      CAST(ntile(8) OVER (ORDER BY n_chars DESC, doc_id)
                           AS INT) AS batch
               FROM documents)
    SELECT batch, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS batch_bytes
    FROM b GROUP BY batch
    """,
)
def o4_range_batching(spark, sf_dir):
    from bitextor_spark.plans.ordering import global_ntile

    docs = T(spark, sf_dir, "documents")
    keys = [F.col("n_chars").desc(), F.col("doc_id")]
    return (
        # count-gated: plain ntile window at inspection scale, range-
        # partitioned exact ntile on the 10^10-row path
        global_ntile(docs, keys, 8, tile_col="batch",
                     small_threshold=500_000, n_rows=docs.count())
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("batch_bytes"),
        )
    )


# =========================================================================
# T5 — set difference: docs with no near-dup partner
# =========================================================================

@q(
    "t5_unpaired_docs",
    f"""
    WITH pairs AS ({_simhash_pairs_sql(bits=60, max_dist=2)})
    SELECT doc_id FROM documents
    EXCEPT
    (SELECT doc_a FROM pairs UNION SELECT doc_b FROM pairs)
    """,
)
def t5_unpaired_docs(spark, sf_dir):
    from bitextor_spark.operators import dedup as D

    docs = T(spark, sf_dir, "documents")
    # 60-bit/d=2 → three exactly-20-bit pigeonhole blocks (1M values per
    # block key): bucket sizes stay ~n/2^20 at web scale, same scale-safe
    # config family as the checked flagship (60-bit/d=4)
    pairs = D.simhash_pairs(docs, "doc_id", "text", bits=60, max_dist=2)
    paired = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return docs.select("doc_id").join(paired, "doc_id", "left_anti")


# =========================================================================
# kNN label vote (classification over the embedding column)
# =========================================================================

@q(
    "knn_label_vote",
    f"""
    WITH scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid, {_COS_SQL} AS cos
      FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
      WHERE q.vec_id < 10),
    top AS (SELECT qid, cid FROM (
              SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY cos DESC, cid) AS rnk
              FROM scored)
            WHERE rnk <= 5),
    votes AS (SELECT qid, e.label AS label, count(*) AS votes
              FROM top JOIN embeddings e ON e.vec_id = top.cid
              GROUP BY 1, 2)
    SELECT qid, label AS pred_label, votes FROM (
      SELECT qid, label, votes,
             row_number() OVER (PARTITION BY qid
                                ORDER BY votes DESC, label) AS r
      FROM votes)
    WHERE r = 1
    """,
)
def knn_label_vote(spark, sf_dir):
    from bitextor_spark.operators import similarity as S

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    top = S.cosine_topk(F.broadcast(queries), corpus, k=5)
    votes = (
        top.join(emb.select(F.col("vec_id").alias("cid"), "label"), "cid")
        .groupBy("qid", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("votes").desc(), "label")
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("qid", F.col("label").cast("bigint").alias("pred_label"), "votes")
    )


# =========================================================================
# Multimodal image pipelines (rows-only: the oracle is the pure-Python
# recompute in tests/test_images.py; image bytes never leave binary columns,
# all decode work happens in Arrow-batched pandas UDFs)
# =========================================================================

_N_IMG = 64


def _image_table(spark, n=_N_IMG):
    """Distributed deterministic image table (input_hint shape): each
    partition synthesizes its rows via mapInPandas — no driver-side bytes."""
    from bitextor_spark.functions.images import make_image_row

    ids = spark.range(n).select(
        F.format_string("img-%04d", F.col("id")).alias("image_id")
    ).repartition(8)

    def gen(batches):
        for pdf in batches:
            rows = [make_image_row(i) for i in pdf["image_id"]]
            yield pd.DataFrame(rows)

    return ids.mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )


def _img_pipeline_oracle() -> str:
    from bitextor_spark.expected_fixtures import EXPECTED_SQL

    return EXPECTED_SQL["img_pipeline"]


@q("img_pipeline", _img_pipeline_oracle())
def img_pipeline(spark, sf_dir):
    """The image training-data pipeline in one Arrow-batched mapInPandas
    pass: decode the binary column → per-channel mean features → phash
    recompute check → 16×16 nearest-neighbor resize → PNG re-encode +
    content digest; aggregated per fmt (formerly img_decode_features +
    img_resize_grid — one pass, one driver row). Oracle: the expected
    aggregate recomputed driver-free in pure numpy at fixture-build time
    (tools/build_fixtures.py) and baked as VALUES literals; the codecs are
    additionally pixel-oracled in tests/test_images.py."""
    import hashlib

    from bitextor_spark.functions.images import decode_image, phash64, png_encode

    imgs = _image_table(spark)

    def stage(batches):
        for pdf in batches:
            out = []
            for iid, blob, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["phash"]
            ):
                px = decode_image(bytes(blob))
                means = px.reshape(-1, 3).mean(axis=0)
                h, w, _ = px.shape
                yi = (np.arange(16) * h // 16).astype(int)
                xi = (np.arange(16) * w // 16).astype(int)
                small = px[np.ix_(yi, xi)]
                enc = png_encode(np.ascontiguousarray(small))
                out.append(
                    {
                        "image_id": iid,
                        "fmt": fmt,
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "phash_match": bool(phash64(px) == ph) if fmt == "png" else None,
                        "digest": hashlib.md5(enc).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    f = imgs.mapInPandas(
        stage,
        "image_id string, fmt string, mean_r double, mean_g double, "
        "mean_b double, phash_match boolean, digest string",
    )
    return f.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("mean_r"), 2).alias("avg_r"),
        F.round(F.avg("mean_g"), 2).alias("avg_g"),
        F.round(F.avg("mean_b"), 2).alias("avg_b"),
        F.sum(F.when(F.col("phash_match"), 1).otherwise(0)).alias("n_phash_ok"),
        F.countDistinct("digest").alias("n_thumbs"),
    )


_N_PHASH_IMGS = 192


def _phash_pairs_oracle() -> str:
    """DuckDB twin for img_phash_neardup: the expected phash of every
    synthesized image is computed HERE with the same pure-Python generator
    the pytest pixel-oracle uses (functions/images.make_image_row — fully
    determined by image_id, no wall clock/randomness) and embedded as
    literals; the oracle then mines pairs with the identical bit-block
    pigeonhole + hamming filter. The Spark side recomputes each phash FROM
    THE DECODED BYTES, so a codec or miner regression on either side breaks
    the hash match. `(sh >> off) & mask` keeps original bits [off, off+w)
    regardless of sign, matching Spark's shiftrightunsigned+mask."""
    from bitextor_spark.functions.images import (
        decode_image,
        make_image_row,
        phash64,
    )
    from bitextor_spark.operators.dedup import _pigeonhole_blocks

    def expected_phash(i: int) -> int:
        # phash of the DECODED pixels (what the Spark side recomputes):
        # for the lossy fmt this differs from the stored pre-encode phash
        return phash64(decode_image(make_image_row("img-%04d" % i)["bytes"]))

    vals = ", ".join(
        "('img-%04d', %d)" % (i, expected_phash(i))
        for i in range(_N_PHASH_IMGS)
    )
    blocks = " UNION ALL ".join(
        f"SELECT img, sh, {i} AS blk, (sh >> {off}) & {(1 << w) - 1} AS val FROM ph"
        for i, (off, w) in enumerate(_pigeonhole_blocks(64, 3))
    )
    return f"""
    WITH ph(img, sh) AS (VALUES {vals}),
    blocks AS ({blocks})
    SELECT DISTINCT a.img AS img_a, b.img AS img_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
    FROM blocks a JOIN blocks b
      ON a.blk = b.blk AND a.val = b.val AND a.img < b.img
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """


@q("img_phash_neardup", _phash_pairs_oracle())
def img_phash_neardup(spark, sf_dir):
    """Perceptual-hash near-duplicate mining over the image table — the
    input_hint phash:int64 through the same bit-block pigeonhole equi-join
    as text simhash (operators/dedup.hamming_pairs, 64 bits / d=3 → four
    16-bit blocks, the classic web-dedup layout). The phash is RECOMPUTED
    from the decoded image bytes in Arrow batches (not read from the
    column), so the driver's oracle comparison gates the full decode →
    phash → pair-mining path against the pure-Python literals."""
    from bitextor_spark.functions.images import decode_image, phash64
    from bitextor_spark.operators.dedup import hamming_pairs

    imgs = _image_table(spark, n=_N_PHASH_IMGS)

    def rehash(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc": pdf["image_id"],
                    "sh": [
                        phash64(decode_image(bytes(b))) for b in pdf["bytes"]
                    ],
                }
            )

    hashed = imgs.mapInPandas(rehash, "doc string, sh long")
    return (
        hamming_pairs(hashed, bits=64, max_dist=3)
        .withColumnRenamed("doc_a", "img_a")
        .withColumnRenamed("doc_b", "img_b")
    )
