"""Many-stream serving example: the native StreamingEngine with dynamic
attach/detach, simulating thousands of concurrent callers on one chip.

    python examples/streaming_server.py [n_slots] [n_ticks]
"""

import sys
import time

import numpy as np

from rnnoise_tpu import RNNoise
from rnnoise_tpu.config import FRAME_SIZE
from rnnoise_tpu.runtime.engine import StreamingEngine
from rnnoise_tpu.weights.registry import load_registered


def main():
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    chunk = 8

    model = RNNoise(load_registered("rnnoise_synth_v1.blob"))
    eng = StreamingEngine(n_slots, model, chunk_frames=chunk)

    rng = np.random.default_rng(0)
    slots = [eng.attach() for _ in range(n_slots // 2)]   # start half-full
    t0 = time.perf_counter()
    frames_done = 0
    for tick in range(n_ticks):
        # simulate arrivals/departures
        if tick % 5 == 1 and len(slots) < n_slots:
            slots.append(eng.attach())
        if tick % 7 == 3 and len(slots) > 1:
            eng.detach(slots.pop(0))
        # feed audio
        for s in slots:
            eng.push(s, (3000 * rng.standard_normal(chunk * FRAME_SIZE)
                         ).astype(np.int16))
        frames_done += eng.tick() * chunk
    dt = time.perf_counter() - t0
    audio_sec = frames_done * FRAME_SIZE / 48000.0
    print(f"{len(slots)} live streams; {frames_done} frames "
          f"({audio_sec:.1f} s audio) in {dt:.2f} s "
          f"-> {audio_sec / dt:.1f}x realtime aggregate")
    for s in slots[:3]:
        got = eng.pull(s, 4 * FRAME_SIZE)
        print(f"slot {s}: pulled {len(got)} denoised samples")


if __name__ == "__main__":
    main()
