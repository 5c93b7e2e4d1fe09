from .pages import synth_pages, orders_schema_spec, PAGES_SCHEMA  # noqa: F401
