from .pipeline import apply_batch, run_stream  # noqa: F401
