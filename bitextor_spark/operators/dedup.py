"""Deduplication family: exact, minhash-LSH, simhash, n-gram Jaccard,
embedding-cosine — the operators a 100 TB training-data pipeline runs over
crawl output.

Reference semantics: sort-based first-per-group dedup with URL collection
(bitextor_build_TMX.py:222-344, keys per Snakefile:1824-1831, presort
Snakefile:1543-1608 → A5), content-hash dedup across crawls
(bitextor_warc2preprocess.py mmh3 block → C15).

Scale notes (100 TB):
- exact dedup is a hash shuffle on the dedup key — AQE skew-split handles
  hot keys; the key is a fixed-width hash, never the payload.
- minhash-LSH: signatures are computed per-row (narrow), candidate pairs
  come from an equi-join on (band, band_hash) buckets — the classic
  shingle→minhash→band→bucket-join; no all-pairs product ever forms.
- simhash pairs: bit-block pigeonhole (Manku et al., WWW'07 §3) — split the
  hash into max_dist+1 blocks; any pair within hamming ≤ max_dist must agree
  on ≥1 whole block, so candidates come from an equi-join on
  (block_idx, block_value) and the plan never forms a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bitextor_spark.functions.hashes import MINHASH_SALTS, h64
from bitextor_spark.functions.text import tokens


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism before
    an expensive narrow stage. Two jobs at once: (a) single-file dev inputs
    (one row group = one scan task) fan out across all cores; (b) the
    Exchange is a materialization boundary, so per-row signatures are
    computed ONCE below it instead of being projection-collapsed into a
    self-join filter and re-evaluated per candidate pair."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n)


def first_per_group(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """A5: collapse groups to their best row + group size."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    cw = Window.partitionBy(*key_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dupes", F.count(F.lit(1)).over(cw).cast("bigint"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def token_hashes(text_col: Column) -> Column:
    """Distinct-token 60-bit hashes (set semantics)."""
    return F.transform(F.array_distinct(tokens(text_col)), h64)


def minhash_signature(text_col: Column, n_hashes: int | None = None) -> Column:
    """Array of minhashes: min over tokens of (h64(token) XOR salt_i)."""
    ths = token_hashes(text_col)
    salts = MINHASH_SALTS if n_hashes is None else MINHASH_SALTS[:n_hashes]

    def xor_with(salt: int):
        # closure factory: a 2-arg lambda would receive (element, index)
        return lambda h: h.bitwiseXOR(F.lit(salt))

    return F.array(
        *[F.array_min(F.transform(ths, xor_with(s))) for s in salts]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Candidate duplicate pairs: docs sharing ≥1 LSH band.

    bands of r = n_hashes/n_bands minhashes each; band key = md5 of the
    ':'-joined band. Returns distinct (doc_a < doc_b).

    The signature stays in the per-row array form DELIBERATELY: an
    explode→groupBy codegen re-expression (the trick that pays for the
    60-pass simhash below) was raced interleaved at sf0.1 and LOST ~5x
    (median 1.7 s vs ~8 s) — 16 interpreted array walks are cheaper than
    the extra full exchange + 16-column hash-agg the explode form adds.
    """
    r = n_hashes // n_bands
    sig = _spread(df).select(
        F.col(id_col).alias("doc"),
        minhash_signature(F.col(text_col), n_hashes).alias("sig"),
    )
    bands = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ":",
                                *[F.col("sig")[b * r + i].cast("string")
                                  for i in range(r)],
                            )
                        ).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.bh")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def simhash_col(text_col: Column, bits: int = 32) -> Column:
    """Simhash over distinct tokens: bit b set iff Σ±1 over token-hash bit b
    is positive. JVM-only (aggregate over the token-hash array)."""
    ths = token_hashes(text_col)

    def bit_counter(bb: int):
        # closure factory: F.aggregate requires an exactly-2-arg lambda
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(1 << bb)) != 0, 1
        ).otherwise(-1)

    terms = []
    for b in range(bits):
        cnt = F.aggregate(ths, F.lit(0), bit_counter(b))
        terms.append(F.when(cnt > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total.cast("bigint")


def _pigeonhole_blocks(bits: int, max_dist: int) -> list[tuple[int, int]]:
    """(offset, width) for max_dist+1 near-equal bit blocks covering `bits`.

    Pigeonhole: a pair with hamming ≤ max_dist has max_dist differing bits
    spread over max_dist+1 blocks → at least one block is bit-identical."""
    nblocks = max_dist + 1
    base, rem = divmod(bits, nblocks)
    assert base >= 1, f"bits={bits} too small for max_dist={max_dist}"
    blocks, off = [], 0
    for i in range(nblocks):
        w = base + (1 if i < rem else 0)
        blocks.append((off, w))
        off += w
    return blocks


def hamming_pairs(
    hashed: DataFrame,  # (doc, sh) — any 64-bit-or-less integer fingerprint
    bits: int,
    max_dist: int,
) -> DataFrame:
    """Pairs within hamming ≤ max_dist by the bit-block pigeonhole
    equi-join (exact — no recall loss): explode each fingerprint into
    max_dist+1 (block_idx, block_value) keys, self-join on the key,
    Hamming-filter, dedupe pairs found via several agreeing blocks.
    Shuffle keys are 8-byte (blk,val) ints; no cross join forms at any
    scale. Block entropy (bits/(d+1)) sets the pruning power — production
    near-dup uses 64-bit hashes with d ≤ 4 (≥ 12-bit blocks; Manku et al.,
    WWW'07). Works for any integer fingerprint column: simhash over text,
    perceptual phash over images (input_hint phash:int64), etc."""
    blocks = _pigeonhole_blocks(bits, max_dist)
    bands = hashed.select(
        "doc",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sh", off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("val"),
                    )
                    for i, (off, w) in enumerate(blocks)
                ]
            )
        ).alias("bk"),
    ).select("doc", "sh", "bk.blk", "bk.val")
    l, r = bands.alias("l"), bands.alias("r")
    dist = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            dist.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int
) -> DataFrame:
    """(doc, sh) simhash fingerprints via explode → codegen hash-agg.

    Same signature as :func:`simhash_col` (bit b set iff Σ±1 over distinct
    token hashes' bit b is positive; empty/null token set → sh=0), but in
    ONE codegen pass instead of `bits` interpreted ``F.aggregate`` walks of
    the token array per row — the interpreted-HOF trap measured in
    tools/bench_discovery_ab.py. The groupBy is a map-side partial
    aggregate; the shuffle carries one `bits`-column row per doc per input
    partition."""
    ex = _spread(df).select(
        F.col(id_col).alias("doc"),
        # explode_outer keeps empty/null-token docs (one null-hash row);
        # the null-guard below makes that row contribute 0 to every bit
        # count, so such docs land at sh=0 exactly like the per-row path
        F.explode_outer(token_hashes(F.col(text_col))).alias("h"),
    )
    aggs = [
        F.sum(
            F.when(F.col("h").isNull(), F.lit(0))
            .when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"c{b}")
        for b in range(bits)
    ]
    cnt = ex.groupBy("doc").agg(*aggs)
    total = F.lit(0)
    for b in range(bits):
        total = total + F.when(F.col(f"c{b}") > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
    return cnt.select("doc", total.cast("bigint").alias("sh"))


def simhash_signatures_packed(
    df: DataFrame, id_col: str, text_col: str, bits: int
) -> DataFrame:
    """SWAR re-expression of :func:`simhash_signatures`: pack 3 per-bit
    set-counters into each 64-bit sum (21-bit lanes: lane j of sum_k counts
    bit ``k + j*ceil(bits/3)``), so the codegen hash-agg updates
    ``ceil(bits/3)+1`` buffer slots per token instead of ``bits``. A lane
    saturates only past 2^21-1 distinct tokens per doc — two orders of
    magnitude beyond any real document. The sign test recovers the
    Σ±1 form exactly: sign_b = (2*cnt_set_b − n_tokens) > 0.

    MEASURED: no separation from the per-bit form beyond noise at
    sf0.1/32c (tools/bench_simhash_ab.py — the agg buffer width is not
    the cost; tokenize/md5/explode volume is). The simpler per-bit form
    stays shipped; this one is retained as the raced alternative, pinned
    bit-identical in tests/test_dedup_forms.py."""
    stride = (bits + 2) // 3  # lanes per sum; bit b lives in sum_{b % stride}
    ex = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode_outer(token_hashes(F.col(text_col))).alias("h"),
    )
    aggs = []
    for k in range(stride):
        lanes = [b for b in (k, k + stride, k + 2 * stride) if b < bits]
        packed = None
        for j, b in enumerate(lanes):
            lane = (
                F.shiftrightunsigned("h", b)
                .bitwiseAND(F.lit(1))
                .cast("long")
            )
            shifted = F.shiftleft(lane, 21 * j) if j else lane
            packed = shifted if packed is None else packed + shifted
        aggs.append(
            F.sum(
                F.when(F.col("h").isNull(), F.lit(0)).otherwise(packed)
            ).alias(f"s{k}")
        )
    aggs.append(F.count("h").alias("n"))  # count skips nulls
    cnt = ex.groupBy("doc").agg(*aggs)
    total = F.lit(0)
    mask = (1 << 21) - 1
    for b in range(bits):
        k, j = b % stride, b // stride
        c = F.shiftrightunsigned(F.col(f"s{k}"), 21 * j).bitwiseAND(
            F.lit(mask)
        )
        total = total + F.when(
            c * 2 > F.col("n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
    return cnt.select("doc", total.cast("bigint").alias("sh"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, max_dist: int = 4
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ max_dist (text front
    end over :func:`hamming_pairs`)."""
    sh = simhash_signatures(df, id_col, text_col, bits)
    return hamming_pairs(sh, bits, max_dist)


def ngram_jaccard_pairs_carried(
    df: DataFrame,
    id_col: str,
    shingle_col: Column,
    threshold: float,
) -> DataFrame:
    """Carried-size formulation of :func:`ngram_jaccard_pairs` (same exact
    output): ``arr = array_distinct(shingles)`` is projected ONCE (the
    multi-referenced non-cheap alias keeps CollapseProject from inlining
    it), ``sz = size(arr)`` rides the exploded rows as one int, and the
    pair aggregation recovers sza/szb with ``max()`` — eliminating the
    separate sizes branch and its two paste joins.

    MEASURED SLOWER ~4x than :func:`ngram_jaccard_pairs` at sf0.1/32c
    (tools/bench_ngram_ab.py: median 9.95 s vs 2.55 s, outputs checksum-
    identical): the multi-referenced ``arr`` alias under the Generate
    defeats codegen subexpression handling, while v0's "duplicated" sizes
    branch is a cheap independent codegen job whose paste joins AQE
    broadcasts. Retained as the raced alternative (the registry uses v0);
    forms pinned bit-identical in tests/test_dedup_forms.py."""
    base = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingle_col).alias("arr"),
    )
    ex = base.select(
        "doc",
        F.size("arr").cast("int").alias("sz"),
        F.explode("arr").alias("sh_str"),
    ).select("doc", "sz", h64(F.col("sh_str")).alias("sh"))
    exd = ex.dropDuplicates(["doc", "sh"])
    inter = (
        exd.alias("l")
        .join(
            exd.alias("r"),
            (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max(F.col("l.sz")).alias("sza"),
            F.max(F.col("r.sz")).alias("szb"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: Column,
    threshold: float,
) -> DataFrame:
    """Exact n-gram-set Jaccard via the shingle equi-join (never all-pairs):
    explode distinct shingles → self-join on shingle → |∩| per pair →
    J = |∩| / (|A|+|B|−|∩|) ≥ threshold. The join key is the 60-bit
    shingle hash, not the shingle string — 8-byte shuffle/compare keys
    (collision odds over a shingle vocabulary are ~2^-60·|V|², nil)."""
    ex = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingle_col)).alias("sh_str"),
    ).select("doc", h64(F.col("sh_str")).alias("sh"))
    # |A| counts distinct shingle STRINGS (pre hash-dedup) — identical to the
    # string-side oracle; the join side dedupes (doc, sh) so a within-doc
    # 60-bit collision can't double-count an intersection row.
    sizes = ex.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    exd = ex.dropDuplicates(["doc", "sh"])
    inter = (
        exd.alias("l")
        .join(exd.alias("r"), (F.col("l.sh") == F.col("r.sh")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
