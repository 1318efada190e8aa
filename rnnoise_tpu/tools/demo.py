"""rnnoise_demo equivalent (reference examples/rnnoise_demo.c:33-69):

    python -m rnnoise_tpu.tools.demo [--model weights_blob.bin] \
        [--streams N] [--chunk-frames T] <in.pcm> <out.pcm>

Raw 48 kHz mono 16-bit PCM in/out.  Like the C demo, the first output frame is
dropped (the pipeline primes its lookahead).  ``--streams N`` processes the
same file as N independent streams (throughput demonstration); output is
stream 0.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..api import RNNoise, StreamDenoiser
from ..config import FRAME_SIZE


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None,
                   help="weights_blob.bin (default: compiled-in demo model)")
    p.add_argument("--streams", type=int, default=1)
    p.add_argument("--chunk-frames", type=int, default=16,
                   help="frames per device dispatch")
    p.add_argument("infile")
    p.add_argument("outfile")
    args = p.parse_args(argv)

    import os
    if not os.path.exists(args.infile):
        p.error(f"input file not found: {args.infile}")
    if args.model:
        model = RNNoise.from_filename(args.model)
    else:
        from ..config import DEFAULT_MODEL
        from ..weights.registry import load_registered
        model = RNNoise(load_registered("rnnoise_synth_v1.blob"),
                        DEFAULT_MODEL)

    den = StreamDenoiser(args.streams, model)
    pcm = np.fromfile(args.infile, dtype="<i2").astype(np.float32)
    n_frames = len(pcm) // FRAME_SIZE
    pcm = pcm[: n_frames * FRAME_SIZE].reshape(n_frames, FRAME_SIZE)

    out = np.empty_like(pcm)
    T = args.chunk_frames
    for i in range(0, n_frames, T):
        chunk = pcm[i:i + T]                                # [t, 480]
        batch = np.broadcast_to(chunk[None], (args.streams,) + chunk.shape)
        res, vad = den.process_chunk(np.ascontiguousarray(batch))
        out[i:i + T] = res[0]

    # first frame dropped, mirroring the C demo (rnnoise_demo.c:57)
    flat = out.reshape(-1)[FRAME_SIZE:]
    np.clip(np.round(flat), -32768, 32767).astype("<i2").tofile(args.outfile)
    print(f"processed {n_frames} frames x {args.streams} streams",
          file=sys.stderr)


if __name__ == "__main__":
    main()
