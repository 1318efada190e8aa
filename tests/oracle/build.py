"""Build the reference C oracle shared libraries (cached).

Produces, under tests/oracle/_build/:
  * rnnoise_data.c/.h     — random seeded model exported by the reference's
                            own exporter (gen_model.py)
  * weights_blob.bin      — the binary weight blob (write_weights tool)
  * liboracle_float.so    — reference compiled on its float-weights path
  * liboracle_int8.so     — reference with -DDISABLE_DEBUG_FLOAT (s8 path)

Both libraries are compiled with -U__SSE2__ -U__AVX__ so vec.h falls back to
the generic C kernels (s8 quantisation, rational tanh approximations) — the
baseline numerics our TPU implementation matches (SURVEY.md §7 hard part 3).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BUILD = os.path.join(HERE, "_build")
REF = "/root/reference"
SRC = os.path.join(REF, "src")

_C_SOURCES = ["kiss_fft.c", "pitch.c", "celt_lpc.c", "rnn.c",
              "nnet.c", "nnet_default.c", "parse_lpcnet_weights.c",
              "rnnoise_tables.c"]

_CFLAGS = ["-O2", "-g", "-fPIC", "-U__SSE2__", "-U__AVX__", "-fvisibility=default",
           "-I" + SRC, "-I" + os.path.join(REF, "include"), "-I" + BUILD,
           "-I" + HERE]

_STAMP = os.path.join(BUILD, ".stamp-v4")


def _run(cmd, **kw):
    subprocess.run(cmd, check=True, **kw)


def build(force: bool = False) -> str:
    if os.path.exists(_STAMP) and not force:
        return BUILD
    os.makedirs(BUILD, exist_ok=True)

    if not os.path.exists(os.path.join(BUILD, "rnnoise_data.c")) or force:
        _run([sys.executable, os.path.join(HERE, "gen_model.py"), BUILD])

    srcs = [os.path.join(SRC, s) for s in _C_SOURCES]
    srcs += [os.path.join(BUILD, "rnnoise_data.c"), os.path.join(HERE, "shim.c")]

    for name, extra in (("liboracle_float.so", []),
                        ("liboracle_int8.so", ["-DDISABLE_DEBUG_FLOAT"])):
        _run(["gcc", "-shared", "-o", os.path.join(BUILD, name)]
             + _CFLAGS + extra + srcs + ["-lm"])

    # weights blob exporter (reference src/write_weights.c:71-77)
    _run(["gcc", "-o", os.path.join(BUILD, "dump_weights_blob"),
          "-DDUMP_BINARY_WEIGHTS"] + _CFLAGS +
         [os.path.join(SRC, "write_weights.c"), "-lm"])
    _run([os.path.join(BUILD, "dump_weights_blob")], cwd=BUILD)

    with open(_STAMP, "w") as f:
        f.write("ok")
    return BUILD


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(BUILD)
