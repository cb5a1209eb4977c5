"""Public scalar / expression function library.

One import surface for the engine's reusable column expressions — every
function here returns a ``pyspark.sql.Column`` (or a column factory) built
from JVM-side built-ins, usable in any DataFrame pipeline. The heavier
DataFrame->DataFrame operators live in ``..operators``; this module is the
"functions" tier the architecture promises (SURVEY §7): what a user would
reach for to compose their own queries against lake tables.
"""

from __future__ import annotations

# vector math (similarity kernels)
from ..operators.similarity import (  # noqa: F401
    as_double_array,
    cosine_expr,
    dot_expr,
    norm_expr,
)

# text analysis
from ..operators.text import (  # noqa: F401
    char_count,
    fingerprint,
    gram_hashes,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    winnowing_from_hashes,
    word_token_count,
)

# hashing / sketching primitives
from ..operators.dedup import (  # noqa: F401
    band_hashes,
    char_shingles,
    hamming64,
    minhash_signature,
    minhash_signature_pandas,
    shingle_hashes,
    simhash,
    token_hashes,
    word_shingles,
)

# as-of / utility
from ..operators.util import salted_join, spread  # noqa: F401

__all__ = [
    "as_double_array", "cosine_expr", "dot_expr", "norm_expr",
    "char_count", "fingerprint", "gram_hashes", "lang_id",
    "mean_token_len", "punct_ratio", "quality_score", "stopword_ratio",
    "token_count", "tokens", "winnowing_from_hashes", "word_token_count",
    "band_hashes", "char_shingles", "hamming64", "minhash_signature",
    "minhash_signature_pandas", "shingle_hashes", "simhash",
    "token_hashes", "word_shingles",
    "salted_join", "spread",
]
