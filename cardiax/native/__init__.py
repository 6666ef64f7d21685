"""Native host-side data engine (C++ via ctypes) with numpy fallback.

Build once per machine with ``python -m cardiax.native.build`` (or let
`load_native()` build lazily). Every entry point has identical-semantics
numpy/scipy fallbacks, so the framework runs with or without a compiler.
"""

from cardiax.native.lib import (
    native_available,
    load_native,
    rotate_stack,
    roll_stack,
    collate_pad,
)

__all__ = ["native_available", "load_native", "rotate_stack", "roll_stack",
           "collate_pad"]
