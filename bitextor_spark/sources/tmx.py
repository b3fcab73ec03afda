"""TMX sink (S7) — Translation Memory eXchange shards.

The reference serializes aligned segment pairs into one TMX document
(bitextor/bitextor_build_TMX.py: header lines ~90-120, per-<tu> emission
~197-344, XML escaping of segment text). Spark-first shape: each partition
emits one complete, well-formed ``part-*.tmx`` document — the same
shard-per-task layout as the WARC sink, since a 100 TB corpus cannot be a
single XML stream. The <tu> XML itself is built by JVM expressions
(functions/text.xml_escape + concat), so the sink's mapInPandas does pure
IO, no per-row Python string work.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bitextor_spark.functions.text import xml_escape

_HEADER = (
    '<?xml version="1.0"?>\n'
    '<tmx version="1.4">\n'
    ' <header o-tmf="PlainText" srclang="{srclang}" adminlang="en"'
    ' datatype="plaintext" segtype="sentence" creationtool="bitextor-spark"'
    ' creationdate="{date}"/>\n'
    " <body>\n"
)
_FOOTER = " </body>\n</tmx>\n"
_FIXED_DATE = "20240101T000000Z"  # TMX %Y%m%dT%H%M%S (F18); deterministic


def tu_xml(
    tuid: Column, src_lang: str, src_text: Column, trg_lang: Column,
    trg_text: Column,
) -> Column:
    """One <tu> element as a JVM-built string (escaping per F17)."""
    return F.concat(
        F.lit('  <tu tuid="'), tuid.cast("string"), F.lit('">'),
        F.lit(f'<tuv xml:lang="{src_lang}"><seg>'), xml_escape(src_text),
        F.lit("</seg></tuv>"),
        F.lit('<tuv xml:lang="'), trg_lang, F.lit('"><seg>'),
        xml_escape(trg_text),
        F.lit("</seg></tuv></tu>"),
    )


def write_tmx_shards(
    tus: DataFrame, out_dir: str, srclang: str = "en"
) -> None:
    """Sink: ``part-<pid>.tmx`` per partition; input column ``tu`` holds
    the pre-built <tu> XML strings (from :func:`tu_xml`)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    header = _HEADER.format(srclang=srclang, date=_FIXED_DATE)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.tmx")
        n = 0
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(header)
            for pdf in batches:
                for tu in pdf["tu"]:
                    fh.write(tu)
                    fh.write("\n")
                    n += 1
            fh.write(_FOOTER)
        yield pd.DataFrame({"path": [path], "n_tus": [n]})

    tus.select("tu").mapInPandas(
        write_partition, "path string, n_tus long"
    ).write.format("noop").mode("overwrite").save()
