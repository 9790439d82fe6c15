"""Deletion-vector file I/O for the Delta-protocol table.

Implements the on-disk DV layout from Delta PROTOCOL.md ("Deletion
Vector Format"):

* a DV file starts with a format-version byte (``1``);
* each stored DV is ``<dataSize: int32 big-endian><data: dataSize
  bytes><crc: int32 big-endian CRC-32 of data>``, and the ``add``
  action's descriptor carries the byte ``offset`` of that dataSize
  field;
* ``data`` is the 64-bit RoaringBitmapArray portable serialization of
  the deleted row indexes (roaring.py);
* the ``deletionVector`` descriptor on the action is
  ``{storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}``.
  ``storageType "u"`` derives the file name from a Z85-encoded UUID
  (``deletion_vector_<uuid>.bin`` under an optional random prefix);
  ``"p"`` is an absolute path; ``"i"`` inlines the data as Z85.

This writer always emits ``"u"`` files (relative — the table stays
relocatable); the reader accepts all three storage types.
"""

from __future__ import annotations

import os
import struct
import uuid as uuid_mod
import zlib

from . import roaring

_FORMAT_VERSION = 1


def write_dv(location: str, indexes) -> dict:
    """Serialize ``indexes`` (deleted row positions) into a fresh
    ``deletion_vector_<uuid>.bin`` under ``location`` and return the
    protocol descriptor for the add action."""
    idx = sorted(set(int(i) for i in indexes))
    data = roaring.serialize(idx)
    u = uuid_mod.uuid4()
    fname = f"deletion_vector_{u}.bin"
    path = os.path.join(location, fname)
    tmp = path + f".tmp-{uuid_mod.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(bytes([_FORMAT_VERSION]))
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data)))
    os.replace(tmp, path)
    return {
        "storageType": "u",
        "pathOrInlineDv": roaring.z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(idx),
    }


def dv_file_path(location: str, desc: dict) -> str | None:
    """Absolute path of the DV file a descriptor points at (None for
    inline DVs)."""
    st = desc["storageType"]
    if st == "i":
        return None
    if st == "p":
        return desc["pathOrInlineDv"]
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, ustr = enc[:-20], enc[-20:]
        u = uuid_mod.UUID(bytes=roaring.z85_decode(ustr))
        parts = [location]
        if prefix:
            parts.append(prefix)
        parts.append(f"deletion_vector_{u}.bin")
        return os.path.join(*parts)
    raise ValueError(f"unknown DV storageType {st!r}")


def read_dv(location: str, desc: dict) -> list[int]:
    """Deleted row indexes a descriptor denotes (sorted)."""
    if desc["storageType"] == "i":
        raw = roaring.z85_decode(desc["pathOrInlineDv"])
        data = raw[: desc["sizeInBytes"]]
        return roaring.deserialize(data)
    path = dv_file_path(location, desc)
    with open(path, "rb") as f:
        ver = f.read(1)[0]
        if ver != _FORMAT_VERSION:
            raise ValueError(f"unsupported DV format version {ver}")
        f.seek(desc["offset"])
        (size,) = struct.unpack(">i", f.read(4))
        if size != desc["sizeInBytes"]:
            raise ValueError(
                f"DV size mismatch: file says {size}, descriptor "
                f"{desc['sizeInBytes']}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
        if zlib.crc32(data) != crc:
            raise ValueError(f"DV checksum mismatch in {path}")
    return roaring.deserialize(data)


def write_dvs_grouped(
    hits, location: str, prior_descs: dict, num_records: dict
) -> list:
    """Build one deletion-vector file per data file EXECUTOR-side.

    ``hits`` is a DataFrame of NEWLY deleted ``(__file, __pos)`` rows;
    ``groupBy("__file").applyInPandas`` serializes each file's roaring
    bitmap and writes its ``deletion_vector_<uuid>.bin`` inside the
    task, so the driver never holds a position list — it receives only
    one (path, descriptor-JSON, n_new) row per touched file
    (O(files touched), the same metadata the commit must write anyway).

    ``prior_descs`` maps data path -> existing DV descriptor (merged
    into the new bitmap executor-side); ``num_records`` maps data path
    -> the add action's numRecords (or None) so a fully-dead file
    short-circuits to descriptor None (the caller drops the file
    instead of attaching a DV). Task retries are safe: DV file names
    are fresh UUIDs, and an orphaned bin from a lost task is never
    referenced by the commit (VACUUM collects it).
    """
    import json as _json

    import pandas as pd

    prior = {p: d for p, d in prior_descs.items() if d}
    nrec_map = dict(num_records)

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        path = pdf["__file"].iloc[0]
        new_n = int(pdf["__pos"].nunique())
        merged = set(int(x) for x in pdf["__pos"])
        pr = prior.get(path)
        if pr:
            merged |= set(read_dv(location, pr))
        nrec = nrec_map.get(path)
        if nrec is not None and len(merged) >= nrec:
            desc_json = None  # every physical row dead: drop the file
        else:
            desc_json = _json.dumps(write_dv(location, merged))
        return pd.DataFrame(
            {
                "path": [path],
                "descriptor": [desc_json],
                "n_new": [new_n],
            }
        )

    return (
        hits.groupBy("__file")
        .applyInPandas(build, "path string, descriptor string, n_new bigint")
        .collect()
    )


#: at or below this many total recorded pairs the expansion happens on
#: the DRIVER (mirrors delta_dml.DV_BROADCAST_MAX_PAIRS — under that
#: threshold the anti-join broadcasts, and a BroadcastExchange pulls
#: every pair to the driver anyway, so driver-side expansion adds no
#: memory while skipping a whole Python-worker job: measured 0.9 s ->
#: ~0.02 s for the 17k-pair sf0.1 DV read)
DV_DRIVER_EXPAND_MAX_PAIRS = 2_000_000


def dv_pairs_df(spark, location: str, dv_adds: list, driver_ok=None):
    """The (file, position) pairs a list of DV-bearing add actions
    denotes. At broadcast-grade cardinality the roaring bitmaps are
    decoded on the driver (see DV_DRIVER_EXPAND_MAX_PAIRS) and shipped
    as one Arrow batch; above it the expansion stays EXECUTOR-side:
    one descriptor row per file goes in, ``mapInPandas`` expands it
    through the roaring codec inside the task — the driver ships
    O(files) descriptors, never a position list. ``driver_ok`` lets
    the caller couple this choice to its own broadcast decision (a
    caller that will NOT broadcast the pairs must not get a driver-
    built LocalRelation, which the planner would auto-broadcast).
    Returns None when no add carries a DV."""
    import json as _json

    import pandas as pd

    dvd = [a for a in dv_adds if a.get("deletionVector")]
    if not dvd:
        return None
    total = sum(a["deletionVector"].get("cardinality", 0) for a in dvd)
    if driver_ok is None:
        driver_ok = total <= DV_DRIVER_EXPAND_MAX_PAIRS
    if driver_ok:
        import numpy as np

        files: list = []
        pos_parts: list = []
        for a in dvd:
            pos = read_dv(location, a["deletionVector"])
            files.append(
                np.full(len(pos), a["path"], dtype=object)
            )
            pos_parts.append(np.asarray(pos, dtype="int64"))
        pdf = pd.DataFrame(
            {
                "__dv_file": pd.Series(
                    np.concatenate(files) if files else [], dtype=object
                ),
                "__dv_pos": pd.Series(
                    np.concatenate(pos_parts) if pos_parts else [],
                    dtype="int64",
                ),
            }
        )
        return spark.createDataFrame(
            pdf, "__dv_file string, __dv_pos bigint"
        )

    rows = [(a["path"], _json.dumps(a["deletionVector"])) for a in dvd]

    def expand(batches):
        for pdf in batches:
            for f, d in zip(pdf["__dv_file"], pdf["__dv"]):
                pos = read_dv(location, _json.loads(d))
                yield pd.DataFrame(
                    {"__dv_file": f, "__dv_pos": pd.Series(pos, dtype="int64")}
                )

    # createDataFrame spreads the descriptor rows across
    # leafNodeDefaultParallelism partitions — the expansion
    # parallelizes per file with no explicit repartition (which would
    # put an exchange in every DV read plan)
    desc_df = spark.createDataFrame(rows, "__dv_file string, __dv string")
    return desc_df.mapInPandas(expand, "__dv_file string, __dv_pos bigint")
