"""Deterministic WebDataset-style tar-shard fixture.

WebDataset is the de-facto multimodal training-shard format (tar
archives of ``key.ext`` members, all members of a sample stored
ADJACENTLY; ImageNet/LAION-scale corpora ship this way because tar
streams sequentially). Three shards cover the axes: plain .tar and
gzipped .tar.gz, samples with image + class + caption + JSON
metadata members, samples missing optional members, a MULTI-PART
extension sidecar ("k.depth.npy" → ext "depth.npy" under the
format's split-on-FIRST-dot-of-the-basename rule), and grayscale/
RGB/RGBA images through the committed PNG codec.

Independence structure: samples are DEFINED as dicts first (key,
label, caption, raw image pixels); truth rows are computed from
those dicts with plain stdlib/loop calls BEFORE any tar assembly —
the image truth sha is over the RAW pixels, so the engine's
decode-after-extract must round-trip the committed PNG encoder
bit-exactly (the q143/q151 cross-codec property). Assembly pins tar
metadata (mtime 0, uid/gid 0) and gzip mtime 0 for byte-stable
re-runs.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os
import tarfile

from ..functions import png as PNG

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
WDS_DIR = os.path.join(_HERE, "fixtures", "wds")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "wds_truth.parquet")


def _pix(shard: int, i: int, n: int) -> bytes:
    return bytes((shard * 41 + i * 13 + j * 7 + 9) % 256 for j in range(n))


def _samples(shard: int) -> list:
    """Sample dicts — the pre-assembly source of truth."""
    if shard == 0:
        out = []
        for i in range(4):
            w, h = 5 + i, 4
            out.append(
                {
                    "key": f"train/sample_{i:06d}",
                    "w": w, "h": h, "c": 3,
                    "pix": _pix(shard, i, w * h * 3),
                    "cls": i % 3,
                    "caption": f"ein Bild nummer {i} — süß",
                    "meta": {"src": "fixture", "i": i},
                }
            )
        return out
    if shard == 1:
        return [
            # missing caption; grayscale image
            {"key": "val/s_0001", "w": 6, "h": 6, "c": 1,
             "pix": _pix(shard, 0, 36), "cls": 7,
             "caption": None, "meta": {"split": "val"}},
            # missing metadata; RGBA
            {"key": "val/s_0002", "w": 3, "h": 5, "c": 4,
             "pix": _pix(shard, 1, 60), "cls": 2,
             "caption": "rgba sample", "meta": None},
            # a MULTI-PART extension sidecar (first-dot split rule:
            # "k.depth.npy" is ext "depth.npy" of sample "k")
            {"key": "val/s_0003", "w": 4, "h": 4, "c": 3,
             "pix": _pix(shard, 2, 48), "cls": 0,
             "caption": "has sidecar", "meta": {"k": 1},
             "extra": ("depth.npy", b"\x93NUMPY fake payload")},
        ]
    return [
        {"key": f"shard2_{i:04d}", "w": 4, "h": 3, "c": 3,
         "pix": _pix(shard, i, 36), "cls": (i * 11) % 5,
         "caption": f"caption {i}", "meta": {"i": i}}
        for i in range(3)
    ]


_LAYOUTS = {0: None, 1: "gz", 2: "gz"}


def file_name(shard: int) -> str:
    return f"shard_{shard:03d}.tar" + (
        ".gz" if _LAYOUTS[shard] else ""
    )


def _members_of(s: dict) -> list:
    """(ext, bytes) pairs in on-disk order for one sample."""
    members = [("png", PNG.encode_png(s["w"], s["h"], s["c"], s["pix"]))]
    members.append(("cls", str(s["cls"]).encode()))
    if s["caption"] is not None:
        members.append(("txt", s["caption"].encode("utf-8")))
    if s["meta"] is not None:
        members.append(
            ("json", json.dumps(s["meta"], sort_keys=True).encode())
        )
    if "extra" in s:
        members.append(s["extra"])
    return members


def build_shard(shard: int) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for s in _samples(shard):
            for ext, data in _members_of(s):
                ti = tarfile.TarInfo(f"{s['key']}.{ext}")
                ti.size = len(data)
                ti.mtime = 0
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                tf.addfile(ti, io.BytesIO(data))
    raw = buf.getvalue()
    if _LAYOUTS[shard]:
        return gzip.compress(raw, mtime=0)
    return raw


def generate_shards() -> list:
    return [
        {
            "shard": shard,
            "name": file_name(shard),
            "blob": build_shard(shard),
            "samples": _samples(shard),
        }
        for shard in sorted(_LAYOUTS)
    ]


def truth_rows(sh: dict) -> list:
    """Adjudicated rows from the sample dicts — the image sha is over
    the RAW pixels (pre-encode), so a green row certifies the
    extract → PNG-decode composition, not just the tar walk."""
    rows = []
    for idx, s in enumerate(sh["samples"]):
        rows.append(
            {
                "shard": sh["shard"],
                "sample_idx": idx,
                "key": s["key"],
                "n_members": len(_members_of(s)),
                "cls": s["cls"],
                "caption": s["caption"],
                "width": s["w"],
                "height": s["h"],
                "channels": s["c"],
                "pix_sha": hashlib.sha256(s["pix"]).hexdigest(),
            }
        )
    return rows
