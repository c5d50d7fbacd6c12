from multimodars_tpu._processing import *  # noqa: F401,F403
