from .lww import lww_resolve  # noqa: F401
