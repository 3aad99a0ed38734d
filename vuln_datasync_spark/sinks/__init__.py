from .manifest_table import ManifestTable  # noqa: F401
