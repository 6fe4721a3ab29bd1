#!/usr/bin/env python
"""Audio/video decode + feature constants at multi-GB scale (round-9
verdict item 2): the image family has its measured 4.08 MB/s/core decode
constant (BENCH_IMAGE_SFXL.json); this measures the SAME per-core
payload-throughput constants for the WAV/PCM and RIFF/AVI families, so a
100 TB audio/video plan extrapolates from its OWN modality's numbers
instead of borrowing the image constant.

Corpora (bench-local generators, same pattern as bench_image_sfxl's
bench_pixels — the registry fixtures' synthetic WAV/AVI payloads are
KB-sized oracle probes, far too small to measure a throughput constant):

- audio: N_AUDIO one-second-ish PCM-16 WAVs (16 kHz, mono/stereo
  alternating, 16000 + (doc%5)·2000 samples) — every sample a pure
  integer function of (doc_id, i, c), deterministic and cheap to verify.
- video: N_VIDEO uncompressed AVIs of N_FRAMES 64×48 24-bit DIB frames —
  every pixel a function of (doc_id, t, x, y, c).

Stages measured (each an end-to-end wall over the parquet blob table,
after a page-cache warm read — comparing plans, not cache states):

- wav_decode_stats: decode_wav → integer sample digests (the pure decode
  + reduce constant).
- wav_frame_energy: decode_wav → hop-strided frame energies (decode +
  the canonical first audio feature; rows out ≈ 250/doc).
- avi_decode_stats: decode_avi → per-frame pixel digests (container walk
  + full-frame reduce).
- avi_keyframes: decode_avi → every-4th-frame digests (the standard
  frame-subsample pass; the walk still decodes every frame, so the delta
  vs avi_decode_stats isolates the REDUCE cost, not the decode).

Writes BENCH_AV_SFXL.json; per-phase rows stream to stderr.

Usage: python bench_av_sfxl.py [--audio N] [--video N] [--regen]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_AUDIO = 120_000   # ~16000-24000 samples each => ~4.6 GB of PCM payload
N_VIDEO = 50_000    # 8 frames of 64x48x3 => ~3.7 GB of DIB payload
N_FRAMES = 8
VID_W, VID_H = 64, 48
AUDIO_RATE = 16_000


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fs in os.walk(d)
        for f in fs
    )


def bench_wav_samples(doc_id: int):
    """(n, ch) int16, ~1 s at 16 kHz: sample(i, c) = ((doc_id·37 + i·13 +
    c·101) mod 4001) − 2000 — the registry fixture formula at bench
    length, so the decode output is spot-verifiable."""
    import numpy as np

    n = AUDIO_RATE + (doc_id % 5) * 2000
    ch = 1 + doc_id % 2
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    return (((doc_id * 37 + i * 13 + c * 101) % 4001) - 2000).astype("int16")


def bench_video_frames(doc_id: int):
    """N_FRAMES (VID_H, VID_W, 3) uint8 frames, pixel formula =
    (doc_id·29 + t·59 + x·7 + y·13 + c·101) mod 256 (the fixture formula
    at bench dimensions)."""
    import numpy as np

    x = np.arange(VID_W, dtype=np.int64)[None, :, None]
    y = np.arange(VID_H, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return [
        ((doc_id * 29 + t * 59 + x * 7 + y * 13 + c * 101) % 256).astype(
            "uint8"
        )
        for t in range(N_FRAMES)
    ]


def _gen_wavs(batches):
    import pandas as pd

    from metrics_database_cron_script_spark.functions.audio import encode_wav

    for pdf in batches:
        ids = pdf["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "payload": [
                    encode_wav(bench_wav_samples(int(d)), AUDIO_RATE)
                    for d in ids
                ],
            }
        )


def _gen_avis(batches):
    import pandas as pd

    from metrics_database_cron_script_spark.functions.video import encode_avi

    for pdf in batches:
        ids = pdf["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "payload": [encode_avi(bench_video_frames(int(d))) for d in ids],
            }
        )


def main() -> None:
    args = sys.argv[1:]
    n_audio, n_video = N_AUDIO, N_VIDEO
    if "--audio" in args:
        i = args.index("--audio")
        n_audio = int(args[i + 1])
        del args[i : i + 2]
    if "--video" in args:
        i = args.index("--video")
        n_video = int(args[i + 1])
        del args[i : i + 2]
    regen = "--regen" in args

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.functions import audio as AU
    from metrics_database_cron_script_spark.functions import video as VI

    spark = get_spark("bench_av_sfxl")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.abspath(__file__))
    ncpu = os.cpu_count() or 1

    out: dict = {
        "metric": "av_sfxl",
        "n_audio": n_audio,
        "n_video": n_video,
        "video_frames": N_FRAMES,
        "video_wh": [VID_W, VID_H],
        "audio_rate": AUDIO_RATE,
        "cpus": ncpu,
    }

    def _phase(key: str, obj) -> None:
        out[key] = obj
        print(json.dumps({key: obj}), file=sys.stderr, flush=True)

    def gen_corpus(key: str, dirname: str, n: int, genfn) -> str:
        blob_dir = os.path.join(here, ".bench_cache", dirname)
        if regen or not os.path.isdir(blob_dir):
            shutil.rmtree(blob_dir, ignore_errors=True)
            ids = spark.range(n).select(F.col("id").alias("doc_id")).repartition(256)
            _, wall = _timed(
                lambda: ids.mapInPandas(
                    genfn, schema="doc_id long, payload binary"
                ).write.parquet(blob_dir)
            )
            _phase(key, {
                "docs": n,
                "wall_s": wall,
                "bytes": _dir_bytes(blob_dir),
            })
        else:
            _phase(key, {"reused": True, "docs": n, "bytes": _dir_bytes(blob_dir)})
        return blob_dir

    # ---- audio ------------------------------------------------------------
    wav_dir = gen_corpus("audio_corpus_gen", "sfxl-audio", n_audio, _gen_wavs)
    wavs = spark.read.parquet(wav_dir)
    # page-cache warm must TOUCH the payload column — a bare count() is
    # column-pruned to metadata and leaves the first decode stage paying
    # the cold read (measured 4.4× slower than warm on the 6 GB corpus)
    wavs.agg(F.sum(F.length("payload"))).collect()
    # payload bytes: 44-byte header + 2 bytes/sample/channel
    wav_payload = sum(
        (44 + 2 * (AUDIO_RATE + (d % 5) * 2000) * (1 + d % 2))
        for d in range(n_audio)
    )

    res, wall = _timed(
        lambda: AU.decode_sample_stats(wavs)
        .agg(F.sum("s_weighted"), F.count(F.lit(1)))
        .collect()
    )
    _phase("wav_decode_stats", {
        "docs": n_audio,
        "wall_s": wall,
        "payload_mb_per_s": round(wav_payload / wall / 1e6, 1),
        "payload_mb_per_s_per_core": round(wav_payload / wall / 1e6 / ncpu, 3),
        "audio_seconds_per_s_per_core": round(
            sum((AUDIO_RATE + (d % 5) * 2000) for d in range(n_audio))
            / AUDIO_RATE / wall / ncpu, 1,
        ),
        "digest": str(res[0][0]),
    })

    res, wall = _timed(
        lambda: AU.frame_energy(wavs, frame=512, hop=256)
        .agg(F.sum("energy"), F.count(F.lit(1)))
        .collect()
    )
    _phase("wav_frame_energy", {
        "docs": n_audio,
        "frame": 512,
        "hop": 256,
        "wall_s": wall,
        "frames_out": int(res[0][1]),
        "payload_mb_per_s": round(wav_payload / wall / 1e6, 1),
        "payload_mb_per_s_per_core": round(wav_payload / wall / 1e6 / ncpu, 3),
    })

    # ---- video ------------------------------------------------------------
    avi_dir = gen_corpus("video_corpus_gen", "sfxl-video", n_video, _gen_avis)
    avis = spark.read.parquet(avi_dir)
    avis.agg(F.sum(F.length("payload"))).collect()  # payload-touching warm
    row_bytes = (VID_W * 3 + 3) & ~3
    frame_bytes = row_bytes * VID_H
    avi_payload = n_video * N_FRAMES * frame_bytes  # DIB bodies (dominant)

    res, wall = _timed(
        lambda: VI.decode_frame_stats(avis, every_k=1)
        .agg(F.sum("px_weighted"), F.count(F.lit(1)))
        .collect()
    )
    _phase("avi_decode_stats", {
        "docs": n_video,
        "wall_s": wall,
        "frames_out": int(res[0][1]),
        "payload_mb_per_s": round(avi_payload / wall / 1e6, 1),
        "payload_mb_per_s_per_core": round(avi_payload / wall / 1e6 / ncpu, 3),
        "digest": str(res[0][0]),
    })

    res, wall = _timed(
        lambda: VI.decode_frame_stats(avis, every_k=4)
        .agg(F.sum("px_weighted"), F.count(F.lit(1)))
        .collect()
    )
    _phase("avi_keyframes", {
        "docs": n_video,
        "every_k": 4,
        "wall_s": wall,
        "frames_out": int(res[0][1]),
        "payload_mb_per_s": round(avi_payload / wall / 1e6, 1),
        "payload_mb_per_s_per_core": round(avi_payload / wall / 1e6 / ncpu, 3),
        "note": "the container walk still decodes every frame; the delta "
        "vs avi_decode_stats isolates the per-frame REDUCE cost — frame "
        "SELECTION without decode needs idx1-seek support, which the "
        "uncompressed-DIB family doesn't pay for (decode is one reshape)",
    })

    with open(os.path.join(here, "BENCH_AV_SFXL.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
