from .pipeline import build_all_tables, load_inputs  # noqa: F401
