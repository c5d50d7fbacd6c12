from multimodars_tpu._converters import *  # noqa: F401,F403
