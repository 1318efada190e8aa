"""Minimal single-stream file denoiser (the examples/rnnoise_demo.c analogue,
as library usage rather than the packaged CLI).

    python examples/denoise_file.py in.pcm out.pcm [weights_blob.bin]
"""

import sys

import numpy as np

from rnnoise_tpu import RNNoise, StreamDenoiser
from rnnoise_tpu.config import FRAME_SIZE
from rnnoise_tpu.weights.registry import load_registered


def main():
    infile, outfile = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        model = RNNoise.from_filename(sys.argv[3])
    else:
        model = RNNoise(load_registered("rnnoise_synth_v1.blob"))

    den = StreamDenoiser(1, model)
    pcm = np.fromfile(infile, dtype="<i2").astype(np.float32)
    n = len(pcm) // FRAME_SIZE
    out = []
    first = True
    for f in range(n):
        y, vad = den.process_frame(pcm[f * FRAME_SIZE:(f + 1) * FRAME_SIZE])
        if not first:                    # drop the priming frame
            out.append(y[0])
        first = False
    np.clip(np.round(np.concatenate(out)), -32768,
            32767).astype("<i2").tofile(outfile)


if __name__ == "__main__":
    main()
