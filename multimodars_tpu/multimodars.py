"""Alias of the reference's compiled extension module name.

The reference is a PyO3 package whose Rust kernels live in the binary
submodule ``multimodars.multimodars`` (src/lib.rs #[pymodule]); downstream
code sometimes imports the raw kernels from there directly.  This module
re-exports the TPU-native equivalents under that name (reached as
``multimodars.multimodars`` through the shim's alias finder).
"""

from multimodars_tpu import *  # noqa: F401,F403
from multimodars_tpu import __all__  # noqa: F401
