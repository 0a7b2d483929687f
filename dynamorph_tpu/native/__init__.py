"""Native (C++) host ops.

Currently: a Jonker-Volgenant dense LAP solver (lap.cpp) used by the tracking
stage. Compiled on first use with g++ into the package directory; all callers
fall back to scipy if the toolchain or binary is unavailable.
"""
from .lap import lap_solve, native_lap_available
