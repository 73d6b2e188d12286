"""Build the PST benchmark audio set from YouTube via yt-dlp
(reference: scripts/data/benchmark_download.py).

Requires network access + yt-dlp (neither available in the build
environment — this script is provided for deployments). CSV format matches
the reference's pst_benchmark.csv / metric_benchmark.csv:
url,start,end,audio_type rows; clips are fetched, trimmed, resampled to
48 kHz and peak-normalized.

    python scripts/benchmark_download.py pst_benchmark.csv output_dir/
"""

import argparse
import csv
import os
import shutil
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("csv_path", type=str)
    parser.add_argument("output_dir", type=str)
    parser.add_argument("--sample-rate", type=int, default=48000)
    args = parser.parse_args()

    if shutil.which("yt-dlp") is None:
        sys.exit("yt-dlp not found; install it and run in a networked "
                 "environment.")

    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.csv_path) as f:
        rows = list(csv.DictReader(f))

    import numpy as np

    from st_ito_tpu.utils import load_audio, save_audio

    for i, row in enumerate(rows):
        url = row["url"]
        start = float(row.get("start", 0))
        end = float(row.get("end", start + 30))
        audio_type = row.get("audio_type", "music")
        out_base = os.path.join(args.output_dir,
                                f"{audio_type}_{i:03d}")
        tmp_wav = out_base + "_raw.wav"
        subprocess.run(
            ["yt-dlp", "-x", "--audio-format", "wav",
             "--postprocessor-args",
             f"ffmpeg:-ss {start} -to {end} -ar {args.sample_rate}",
             "-o", tmp_wav, url],
            check=True,
        )
        audio, sr = load_audio(tmp_wav)
        peak = max(abs(audio).max(), 1e-8)
        save_audio(out_base + ".wav", audio / peak, sr)
        os.remove(tmp_wav)
        print(f"[{i + 1}/{len(rows)}] {out_base}.wav")


if __name__ == "__main__":
    main()
