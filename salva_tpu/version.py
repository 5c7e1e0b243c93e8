"""Version of the salva_tpu package."""

__version__ = "0.1.0"
