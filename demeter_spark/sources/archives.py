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


def parse_dbf(blob: bytes, keep_positions: bool = False) -> pd.DataFrame:
    """Minimal dBase III DBF reader (the .vat.dbf sidecar format): header +
    fixed-width ASCII records -> DataFrame of string fields.

    ``keep_positions=True`` adds a ``_rec_no`` column holding each record's
    1-based FILE position (deleted records still consume a position) — the
    implicit .shp<->.dbf join key, which must not shift when a deleted row
    is dropped.

    Mirrors the reference's raw-mode read (dbfread raw=True,
    demeter/raster/usgs/hydrography.py:231-240): every field comes back as a
    stripped string; numeric interpretation (float-encoded ints, null-char
    garbage rows) is the caller's try_cast, exactly like the reference's
    try/except around float(record[...]).
    """
    import struct

    if len(blob) < 12:
        raise ValueError(f"corrupt DBF: {len(blob)} bytes is no header")
    n_records = struct.unpack_from("<I", blob, 4)[0]
    header_size = struct.unpack_from("<H", blob, 8)[0]
    record_size = struct.unpack_from("<H", blob, 10)[0]
    # header invariants BEFORE trusting any of the three sizes: a truncated
    # or corrupt sidecar must fail loudly, not yield empty-string garbage
    # rows (ADVICE r02)
    if header_size < 33 or header_size > len(blob):
        raise ValueError(
            f"corrupt DBF: header_size={header_size} vs {len(blob)} bytes"
        )
    if record_size < 1:
        raise ValueError(f"corrupt DBF: record_size={record_size}")
    if header_size + n_records * record_size > len(blob):
        raise ValueError(
            f"truncated DBF: header {header_size} + {n_records} records "
            f"x {record_size} bytes > {len(blob)} bytes"
        )
    fields: list[tuple[str, int]] = []  # (name, length)
    pos = 32
    while pos < header_size - 1 and blob[pos] != 0x0D:
        if pos + 17 > len(blob):
            raise ValueError("corrupt DBF: field descriptor past end of blob")
        name = blob[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        length = blob[pos + 16]
        fields.append((name, length))
        pos += 32
    if sum(ln for _, ln in fields) + 1 != record_size:
        raise ValueError(
            f"corrupt DBF: field lengths {[ln for _, ln in fields]} + deletion "
            f"flag != record_size {record_size}"
        )
    cols: dict[str, list[str]] = {name: [] for name, _ in fields}
    active = []
    rec = header_size
    for _ in range(n_records):
        deleted = blob[rec : rec + 1] == b"*"
        active.append(not deleted)
        off = rec + 1
        for name, length in fields:
            raw = blob[off : off + length]
            cols[name].append(
                raw.decode("ascii", errors="replace").strip("\x00 ")
            )
            off += length
        rec += record_size
    df = pd.DataFrame(cols)
    if keep_positions:
        df["_rec_no"] = range(1, len(df) + 1)
    return df[pd.Series(active).to_numpy()].reset_index(drop=True)


def dbf_records(
    members: DataFrame, data_col: str = "data", src_cols: tuple[str, ...] = ("src", "member")
) -> DataFrame:
    """Explode extracted .dbf member blobs into records: one row per record,
    fields as a map<string,string> (schemas vary per sidecar; callers
    try_cast the fields they need — S7 DBF sidecar -> dimension map).

    ``rec_no`` is the 1-based record position in file order — the implicit
    join key the shapefile contract defines between a .dbf sidecar and its
    .shp geometry records (see sources/shapefile.py)."""

    def _records(batches):
        for pdf in batches:
            out_src = {c: [] for c in src_cols}
            rec_nos: list[int] = []
            recs: list[dict] = []
            for i in range(len(pdf)):
                table = parse_dbf(bytes(pdf[data_col].iloc[i]), keep_positions=True)
                for _, row in table.iterrows():
                    for c in src_cols:
                        out_src[c].append(pdf[c].iloc[i])
                    rec_nos.append(int(row.pop("_rec_no")))
                    recs.append({k: str(v) for k, v in row.items()})
            out = pd.DataFrame(out_src)
            out["rec_no"] = pd.Series(rec_nos, dtype="int64")
            out["fields"] = pd.Series(recs, dtype=object)
            yield out

    schema = (
        ", ".join(f"{c} STRING" for c in src_cols)
        + ", rec_no BIGINT, fields MAP<STRING, STRING>"
    )
    return members.select(*src_cols, data_col).mapInPandas(_records, schema)
