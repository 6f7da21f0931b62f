from .tables import TABLES, load_all, table  # noqa: F401
