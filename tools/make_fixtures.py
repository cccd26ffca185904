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


def make_media_real(n_rows: int = 120, seed: int = 7) -> pa.Table:
    """fixtures/media_real.parquet — payloads that REALLY decode (24-bit
    BMP images, PCM16 WAV audio; every 10th row a non-decodable 'video'
    blob both sides filter out). Pins ``feat_bits`` (CSV of the float32
    bit patterns) and ``feat_checksum`` computed at generation time by
    the same pure-python decode+featurize the Spark m3 query runs inside
    mapInPandas — a value-hash match proves the distributed decode
    reproduces the features bit-for-bit from raw bytes."""
    from diffdataflowmlpipelines_spark.functions.media_codecs import (
        decode_media_features,
        encode_bmp,
        encode_wav,
        f32_bits_csv,
        feature_checksum,
    )

    rng = np.random.default_rng(seed)
    rows = {k: [] for k in (
        "media_id", "kind", "payload", "width", "height", "duration_ms",
        "feat_bits", "feat_checksum",
    )}
    for i in range(n_rows):
        if i % 10 == 9:
            k, p, w, h, d = "video", rng.bytes(96), None, None, int(rng.integers(100, 60_000))
        elif i % 2 == 0:
            h, w = int(rng.integers(3, 25)), int(rng.integers(3, 25))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            k, p, d = "image", encode_bmp(img), None
        else:
            framerate = int(rng.choice([8000, 16000, 44100]))
            n = int(rng.integers(50, 400))
            samples = rng.integers(-32768, 32768, size=n).astype(np.int16)
            k, p = "audio", encode_wav(samples, framerate)
            w = h = None
            d = int(round(n / framerate * 1000))
        if k == "video":
            bits, chk = None, None
        else:
            feats = decode_media_features(p)
            bits, chk = f32_bits_csv(feats), feature_checksum(feats)
        rows["media_id"].append(f"real-{i:06d}")
        rows["kind"].append(k)
        rows["payload"].append(p)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(d)
        rows["feat_bits"].append(bits)
        rows["feat_checksum"].append(chk)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
            "feat_bits": pa.array(rows["feat_bits"], pa.string()),
            "feat_checksum": pa.array(rows["feat_checksum"], pa.int64()),
        }
    )


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    t = make_media()
    pq.write_table(t, os.path.join(FIXTURE_DIR, "media.parquet"))
    print(f"wrote {os.path.join(FIXTURE_DIR, 'media.parquet')} rows={t.num_rows}")
    tr = make_media_real()
    pq.write_table(tr, os.path.join(FIXTURE_DIR, "media_real.parquet"))
    print(
        f"wrote {os.path.join(FIXTURE_DIR, 'media_real.parquet')} rows={tr.num_rows}"
    )


if __name__ == "__main__":
    main()
