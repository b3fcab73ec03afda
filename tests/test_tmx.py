"""TMX sink unit test (S7): per-partition shards are well-formed XML with
the expected <tu> count and properly-escaped segment text. The <tu>
string-building parity vs DuckDB runs in test_oracle_parity
(s7_tmx_format)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F


def test_tmx_shards_well_formed(spark):
    from bitextor_spark.sources.tmx import tu_xml, write_tmx_shards

    df = spark.createDataFrame(
        [(i, f"src <{i}> & 'quoted'", "de", f'trg "{i}"') for i in range(20)],
        "tuid int, src string, lang string, trg string",
    ).repartition(3)
    tus = df.select(
        tu_xml(F.col("tuid"), "en", F.col("src"), F.col("lang"),
               F.col("trg")).alias("tu")
    )
    out = tempfile.mkdtemp(prefix="tmx_test_")
    try:
        write_tmx_shards(tus, out)
        parts = sorted(glob.glob(os.path.join(out, "part-*.tmx")))
        assert parts, "no shards written"
        total = 0
        for p in parts:
            root = ET.parse(p).getroot()  # raises if not well-formed XML
            assert root.tag == "tmx"
            tus_found = root.findall("./body/tu")
            total += len(tus_found)
            for tu in tus_found:
                segs = tu.findall("./tuv/seg")
                assert len(segs) == 2
                assert segs[0].text.startswith("src <")  # entities decoded back
        assert total == 20
    finally:
        shutil.rmtree(out, ignore_errors=True)
