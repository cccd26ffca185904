"""Generate committed parquet fixtures (deterministic, seed-pinned).

fixtures/media.parquet — the synthetic multimodal table (same generator
as functions/multimodal.synthetic_media_df, seed=42) materialized so the
DuckDB oracle can see the identical rows the Spark queries read. Adds a
``payload_sha256`` hex column computed at generation time: the Spark
side recomputes the digest from ``payload`` inside its mapInPandas UDF,
so matching the oracle proves the binary column round-trips and the
decode plumbing reads the same bytes.

Usage: PYTHONPATH=/root/repo python tools/make_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "fixtures")


def make_media(n_rows: int = 300, seed: int = 42) -> pa.Table:
    # identical draw order to functions/multimodal.synthetic_media_df
    rng = np.random.default_rng(seed)
    kinds_cycle = ["image", "audio", "video"]
    media_id, kind, payload, width, height, duration = [], [], [], [], [], []
    for i in range(n_rows):
        k = kinds_cycle[i % 3]
        p = rng.bytes(64 + int(rng.integers(0, 64)))
        media_id.append(f"media-{i:06d}")
        kind.append(k)
        payload.append(p)
        width.append(int(rng.integers(16, 512)) if k != "audio" else None)
        height.append(int(rng.integers(16, 512)) if k != "audio" else None)
        duration.append(int(rng.integers(100, 60_000)) if k != "image" else None)
    sha = [hashlib.sha256(p).hexdigest() for p in payload]
    return pa.table(
        {
            "media_id": pa.array(media_id, pa.string()),
            "kind": pa.array(kind, pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "width": pa.array(width, pa.int32()),
            "height": pa.array(height, pa.int32()),
            "duration_ms": pa.array(duration, pa.int32()),
            "payload_sha256": pa.array(sha, pa.string()),
        }
    )


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    t = make_media()
    pq.write_table(t, os.path.join(FIXTURE_DIR, "media.parquet"))
    print(f"wrote {os.path.join(FIXTURE_DIR, 'media.parquet')} rows={t.num_rows}")


if __name__ == "__main__":
    main()
