"""Drop-in compatibility shim: exposes the TPU-native implementation under
the reference package name, so existing ``import multimodars as mm`` code
keeps working unchanged."""

from multimodars_tpu import *  # noqa: F401,F403
from multimodars_tpu import __all__, __version__  # noqa: F401
