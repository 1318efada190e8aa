from . import biquad, pitch, transform  # noqa: F401
