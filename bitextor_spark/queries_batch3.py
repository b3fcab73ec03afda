"""Query registry, batch 3 — source formats, link-set features, encodings.

Covered (SURVEY.md §2 citations):
  S5  prevertical reader: ``<doc lang=...>`` attribute extraction + ISO-639
      normalization (bitextor_prevertical_lang_iso639_1.py:18-60)
  F18 TMX date formatting %Y%m%dT%H%M%S (bitextor_build_TMX.py:197)
  T2  Jaccard of href link sets per doc pair
      (bitextor_url_set_overlap.py:26-81)
  J6  mutually-linked probe: is a's URL in b's extracted link set
      (bitextor_mutually_linked.py:84-95)
  F10 encoding detect/convert cascade utf-8 → iso-8859-1 → cp1252
      (bitextor_warc2preprocess.py:157-169) — pandas UDF over binary
      payloads (rows-only; byte decoding is not DuckDB-expressible)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bitextor_spark.queries import T, q, ts_us

# =========================================================================
# S5 — prevertical format parsing (regex extraction over a text source)
# =========================================================================

_PREVERT_SQL = (
    "'<doc id=\"d' || doc_id || '\" lang=\"' || "
    "CASE WHEN doc_id % 3 = 0 THEN upper(lang) ELSE lang END"
    " || '\" url=\"http://' || source || '.example.com/doc/' || doc_id"
    " || '\">' || text || '</doc>'"
)


@q(
    "s5_prevertical_parse",
    f"""
    WITH p AS (SELECT doc_id, {_PREVERT_SQL} AS line FROM documents)
    SELECT doc_id,
           regexp_extract(line, 'id="([^"]+)"', 1) AS prevert_id,
           lower(regexp_extract(line, 'lang="([^"]+)"', 1)) AS lang_norm,
           regexp_extract(line, 'url="([^"]+)"', 1) AS url,
           len(regexp_extract(line, '>([^<]*)</doc>', 1)) AS body_len
    FROM p
    """,
)
def s5_prevertical_parse(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    line = F.concat(
        F.lit('<doc id="d'), F.col("doc_id").cast("string"),
        F.lit('" lang="'),
        F.when(F.col("doc_id") % 3 == 0, F.upper("lang")).otherwise(F.col("lang")),
        F.lit('" url="http://'), F.col("source"),
        F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        F.lit('">'), F.col("text"), F.lit("</doc>"),
    )
    p = docs.select("doc_id", line.alias("line"))
    return p.select(
        "doc_id",
        F.regexp_extract("line", r'id="([^"]+)"', 1).alias("prevert_id"),
        F.lower(F.regexp_extract("line", r'lang="([^"]+)"', 1)).alias("lang_norm"),
        F.regexp_extract("line", r'url="([^"]+)"', 1).alias("url"),
        F.length(F.regexp_extract("line", r">([^<]*)</doc>", 1)).cast("bigint")
        .alias("body_len"),
    )


# =========================================================================
# F18 — TMX timestamp formatting
# =========================================================================

@q(
    "f18_tmx_dates",
    """
    SELECT strftime(ts, '%Y%m%dT%H%M%S') AS tmx_date, count(*) AS n,
           epoch_us(min(ts)) AS first_us
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
)
def f18_tmx_dates(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return ev.groupBy(
        F.date_format(F.col("ts").cast("timestamp"), "yyyyMMdd'T'HHmmss").alias(
            "tmx_date"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        ts_us(F.min("ts")).alias("first_us"),
    )


# =========================================================================
# T2/J6 — link-set features over extracted hrefs
# =========================================================================

# Per-doc link set from the same synthesized-HTML universe as
# c13_link_extract. source = doc_id % 20 in the test data, so pairs are
# (a, a+20) within a source; the conditional first element varies overlap
# and mutual-link outcomes across pairs.
_LINKSET_SQL = """
    links AS (
      SELECT doc_id, source,
             [CASE WHEN doc_id % 3 = 0
                   THEN 'http://' || source || '.example.com/doc/' || (doc_id + 40)
                   ELSE 'http://' || source || '.example.com/doc/' || (doc_id + 20)
              END,
              'http://' || source || '.example.com/doc/' || (doc_id + 2),
              'http://' || source || '.example.com/doc/' || (doc_id - 20),
              'http://shared.example.com/hub'] AS hrefs
      FROM documents)
"""


@q(
    "t2_href_jaccard",
    f"""
    WITH {_LINKSET_SQL}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.hrefs, b.hrefs)) AS DOUBLE)
                 / len(list_distinct(a.hrefs || b.hrefs)), 4) AS href_jaccard
    FROM links a JOIN links b
      ON a.source = b.source AND b.doc_id = a.doc_id + 20
    """,
)
def t2_href_jaccard(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")

    def hrefs(did):
        base = F.concat(F.lit("http://"), F.col(f"{did}.source"), F.lit(".example.com/doc/"))
        d = F.col(f"{did}.doc_id")
        return F.array(
            F.when(d % 3 == 0, F.concat(base, (d + 40).cast("string")))
            .otherwise(F.concat(base, (d + 20).cast("string"))),
            F.concat(base, (d + 2).cast("string")),
            F.concat(base, (d - 20).cast("string")),
            F.lit("http://shared.example.com/hub"),
        )

    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("b.doc_id") == F.col("a.doc_id") + 20),
    )
    ha, hb = hrefs("a"), hrefs("b")
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(
            F.size(F.array_intersect(ha, hb)).cast("double")
            / F.size(F.array_union(ha, hb)),
            4,
        ).alias("href_jaccard"),
    )


@q(
    "j6_mutually_linked",
    f"""
    WITH {_LINKSET_SQL},
    u AS (SELECT doc_id, source, hrefs,
                 'http://' || source || '.example.com/doc/' || doc_id AS url
          FROM links)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           list_contains(a.hrefs, b.url) AS a_links_b,
           list_contains(b.hrefs, a.url) AS b_links_a,
           (list_contains(a.hrefs, b.url) AND list_contains(b.hrefs, a.url))
             AS mutually_linked
    FROM u a JOIN u b ON a.source = b.source AND b.doc_id = a.doc_id + 20
    """,
)
def j6_mutually_linked(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")

    def withlinks(df):
        base = F.concat(F.lit("http://"), F.col("source"), F.lit(".example.com/doc/"))
        d = F.col("doc_id")
        return df.select(
            "doc_id", "source",
            F.concat(base, d.cast("string")).alias("url"),
            F.array(
                F.when(d % 3 == 0, F.concat(base, (d + 40).cast("string")))
                .otherwise(F.concat(base, (d + 20).cast("string"))),
                F.concat(base, (d + 2).cast("string")),
                F.concat(base, (d - 20).cast("string")),
                F.lit("http://shared.example.com/hub"),
            ).alias("hrefs"),
        )

    a = withlinks(docs).alias("a")
    b = withlinks(docs).alias("b")
    a_links_b = F.array_contains(F.col("a.hrefs"), F.col("b.url"))
    b_links_a = F.array_contains(F.col("b.hrefs"), F.col("a.url"))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("b.doc_id") == F.col("a.doc_id") + 20),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            a_links_b.alias("a_links_b"),
            b_links_a.alias("b_links_a"),
            (a_links_b & b_links_a).alias("mutually_linked"),
        )
    )


# =========================================================================
# F10 — encoding detect/convert cascade (pandas UDF over binary payloads)
# =========================================================================

@q("f10_encoding_normalize")
def f10_encoding_normalize(spark, sf_dir):
    """Encoding cascade: try utf-8, fall back to iso-8859-1, then cp1252
    (bitextor_warc2preprocess.py:157-169). Payload bytes are synthesized
    per-row in a deterministic mix of encodings; the cascade recovers the
    text and reports which codec decoded it. Rows-only (binary decode is
    not DuckDB-expressible); exactness asserted in-line: recovered text
    must equal the original for utf-8/latin-1 rows."""
    docs = T(spark, sf_dir, "documents")
    # deterministically pick an encoding per row and build the byte payload
    enc = (F.col("doc_id") % 3)
    payload = (
        F.when(enc == 0, F.encode(F.concat(F.col("text"), F.lit(" é utf8")), "UTF-8"))
        .when(enc == 1, F.encode(F.concat(F.col("text"), F.lit(" é latin")), "ISO-8859-1"))
        .otherwise(F.encode(F.col("text"), "US-ASCII"))
    )
    src = docs.select("doc_id", "text", payload.alias("payload"))

    def cascade(batches):
        for pdf in batches:
            codecs_used, texts, ok = [], [], []
            for t, raw in zip(pdf["text"], pdf["payload"]):
                b = bytes(raw)
                for codec in ("utf-8", "iso-8859-1", "cp1252"):
                    try:
                        s = b.decode(codec)
                        codecs_used.append(codec)
                        texts.append(s)
                        break
                    except UnicodeDecodeError:
                        continue
                else:
                    codecs_used.append("failed")
                    texts.append("")
                ok.append(texts[-1].startswith(t))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "codec": codecs_used,
                 "recovered_ok": ok}
            )

    out = src.mapInPandas(cascade, "doc_id long, codec string, recovered_ok boolean")
    return out.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("recovered_ok"), 1).otherwise(0)).alias("n_ok"),
    )
