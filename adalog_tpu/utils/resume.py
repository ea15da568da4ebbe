"""Framed append-only resume log shared by calibration and BRECQ.

Format (v2, pickle-free): a sequence of frames, each
``MAGIC || u64-le length || encode_bytes(record)`` where a record is a
``(tag, name, payload)`` tuple whose payload is an arbitrary pytree of
arrays/scalars (utils/checkpoint.py npz framing). Appending after every
completed unit of work makes the log truncation-tolerant: a reader keeps
every complete frame and drops a torn tail, so a killed run resumes at the
last finished site/block. TPU-native addition — the reference has no
mid-run resume (its only persistence is the two whole-model checkpoints,
/root/reference/test_quant.py:95-106).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("adalog_tpu")

RESUME_MAGIC = b"ALRS2\x00"
_HDR_N = len(RESUME_MAGIC) + 8


def resume_scan(path: str | None):
    """Read all complete records; tolerate (and warn on) a truncated tail."""
    if not path or not os.path.exists(path):
        return []
    from adalog_tpu.utils.checkpoint import decode_bytes
    recs = []
    with open(path, "rb") as f:
        first = True
        while True:
            hdr = f.read(_HDR_N)
            if not hdr:
                break
            if len(hdr) < _HDR_N or hdr[:len(RESUME_MAGIC)] != RESUME_MAGIC:
                if first:
                    raise ValueError(
                        f"{path} is not a v2 resume file (the round-2 pickle "
                        "resume format is no longer supported) — delete it "
                        "or pass a fresh path")
                log.warning("resume file %s: truncated record header; "
                            "ignoring the tail", path)
                break
            n = int.from_bytes(hdr[len(RESUME_MAGIC):], "little")
            blob = f.read(n)
            if len(blob) < n:
                log.warning("resume file %s: truncated record; ignoring "
                            "the tail", path)
                break
            recs.append(decode_bytes(blob))
            first = False
    return recs


def resume_append(path: str | None, records):
    """Append records. Device leaves are materialized to host by the encoder
    — this is also a true-sync point (the per-group timings rely on it)."""
    if not path or not records:
        return
    from adalog_tpu.utils.checkpoint import encode_bytes
    frames = []
    for rec in records:
        blob = encode_bytes(rec)
        frames.append(RESUME_MAGIC + len(blob).to_bytes(8, "little") + blob)
    with open(path, "ab") as f:
        f.write(b"".join(frames))
