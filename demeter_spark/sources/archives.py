"""Archive ingestion: zip member extraction (SURVEY.md §2.1 S13).

Capability parity with the reference's zip handling (it downloads SSURGO /
USGS deliveries as zip archives and extracts members before reading, e.g.
demeter/vector/usda/ssurgo.py download paths): archives are rows of a
``binaryFile``-source DataFrame and members are extracted INSIDE a
``mapInPandas`` kernel with the stdlib ``zipfile`` over an in-memory buffer
— bytes never become Python row objects, one Arrow batch in, one out, and a
10^6-archive corpus extracts embarrassingly parallel with no shared
filesystem staging.
"""

from __future__ import annotations

import fnmatch
import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_archives(spark: SparkSession, path: str, glob: str = "*.zip") -> DataFrame:
    """Zip archives as binary rows: (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def extract_members(
    archives: DataFrame,
    member_glob: str = "*",
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Explode zip archives into member rows: (src, member, n_bytes, data).

    ``member_glob`` filters member names (e.g. '*.dbf' — the reference reads
    a single sidecar member out of each SSURGO delivery)."""

    def _extract(batches):
        for pdf in batches:
            srcs, names, sizes, datas = [], [], [], []
            for src, blob in zip(pdf[path_col], pdf[content_col]):
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if info.is_dir() or not fnmatch.fnmatch(
                            info.filename, member_glob
                        ):
                            continue
                        srcs.append(src)
                        names.append(info.filename)
                        sizes.append(info.file_size)
                        datas.append(zf.read(info))
            yield pd.DataFrame(
                {"src": srcs, "member": names, "n_bytes": sizes, "data": datas}
            )

    return archives.select(path_col, content_col).mapInPandas(
        _extract, "src STRING, member STRING, n_bytes BIGINT, data BINARY"
    )
