#!/usr/bin/env python3
"""Generate the committed golden binary-media fixture (testdata/media/).

Deterministic (seeded): 256 media rows with GENUINE binary payloads —
format magic headers + pseudorandom bytes spanning the full 0..255 byte
range (non-ASCII guaranteed), plus typed metadata columns. Shapes:
  - doc_id 0: empty payload (decode edge case)
  - doc_ids 1..9: short payloads (< one 64-byte frame)
  - doc_ids 100..109: exact byte-duplicates of 3*i (near-dup fodder)
  - everything else: 200..1500 bytes
Dev tooling only (driver-side python); the Scala library reads the
committed parquet, never this script.

Usage: python3 scripts/gen_media.py   # writes testdata/media/media.parquet
"""
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

rnd = random.Random(0x6D656469)  # 'medi'

MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "jpeg": b"\xff\xd8\xff\xe0",
    "gif": b"GIF89a",
    "webm": b"\x1a\x45\xdf\xa3",
}
FORMATS = ["png", "jpeg", "gif", "webm"]

N = 256
rows = []
for i in range(N):
    fmt = FORMATS[i % 4]
    if i == 0:
        payload = b""
    elif i < 10:
        payload = MAGIC[fmt] + bytes(rnd.randrange(256)
                                     for _ in range(rnd.randrange(1, 40)))
    else:
        payload = MAGIC[fmt] + bytes(rnd.randrange(256)
                                     for _ in range(rnd.randrange(192, 1493)))
    rows.append({"doc_id": i, "payload": payload,
                 "width": 64 + i % 512, "height": 64 + (i * 7) % 512,
                 "format": fmt})
# exact duplicates AFTER generation so the duplicated bytes are final
for i in range(100, 110):
    src = rows[3 * (i - 100)]
    rows[i]["payload"] = src["payload"]
    rows[i]["format"] = src["format"]

assert any(b > 127 for r in rows for b in r["payload"]), "need non-ASCII bytes"

table = pa.table({
    "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
    "payload": pa.array([r["payload"] for r in rows], pa.binary()),
    "width": pa.array([r["width"] for r in rows], pa.int32()),
    "height": pa.array([r["height"] for r in rows], pa.int32()),
    "format": pa.array([r["format"] for r in rows], pa.string()),
})
out = os.path.join(os.path.dirname(__file__), "..", "testdata", "media")
os.makedirs(out, exist_ok=True)
pq.write_table(table, os.path.join(out, "media.parquet"))
n_bytes = sum(len(r["payload"]) for r in rows)
print(f"wrote {len(rows)} media rows, {n_bytes} payload bytes "
      f"-> {os.path.join(out, 'media.parquet')}")
