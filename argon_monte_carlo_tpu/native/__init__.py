"""Native (C++) physics oracle, loaded via ctypes.

See oracle.cpp for why this exists (independent differential-testing
implementation of every physics kernel).  Built on demand with g++; all
runtime simulation code is pure JAX and never depends on this module.
"""

from .build import load_oracle  # noqa: F401
