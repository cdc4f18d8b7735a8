from .versioned import VersionedTable  # noqa: F401
