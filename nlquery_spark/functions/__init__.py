"""Public column-level function API (the `pyspark.sql.functions`-style
surface of this engine): pure Column -> Column helpers with no
DataFrame or shuffle semantics. Everything here stays JVM-side
(whole-stage codegen) — the vectorized-Python escape hatches live in
`operators/`.
"""

from .text import tokens, token_count  # noqa: F401
from .vectors import cosine, dot, l2_norm  # noqa: F401
