from .pdm_ssd import PDMSSD, build_detector  # noqa: F401
