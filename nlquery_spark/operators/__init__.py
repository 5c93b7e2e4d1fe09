from .extract import extract_triples, dedup_triples, write_triples  # noqa: F401
