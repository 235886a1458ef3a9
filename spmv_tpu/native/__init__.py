"""Native host tier — lazy-built C++ shared library (see spmv_host.cpp)."""

from spmv_tpu.native.lib import get_lib, native_available  # noqa: F401
