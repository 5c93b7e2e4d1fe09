from .dictionary import spec_from_dataframe  # noqa: F401
from .extract import extract_triples, dedup_triples, write_triples  # noqa: F401
