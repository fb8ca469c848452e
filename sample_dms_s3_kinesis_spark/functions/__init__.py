"""Public scalar/column function library — the engine's equivalent of
``pyspark.sql.functions`` for its domain expressions.

Every function here takes and returns :class:`pyspark.sql.Column`, is a
pure Catalyst expression (JVM-side, codegen-able, usable in any
select/filter/agg — batch or streaming), and is re-exported from the
operator module that owns and tests it.  Import surface::

    from sample_dms_s3_kinesis_spark import functions as EF
    df.select(EF.token_count("text"), EF.lang_id(F.col("text")))

Families:

- text:        ``tokens``, ``token_count``, ``char_count``,
               ``punct_count``, ``stopword_count``, ``avg_token_len``,
               ``lang_id``, ``fingerprint``, ``rolling_hashes``,
               ``bpe_ish_tokens``, ``bpe_ish_token_count``
- shingling:   ``token_ngrams``, ``minhash_signature``
- similarity:  ``cosine_similarity``, ``hyperplane_signature``
- sampling:    ``hash_bucket`` (deterministic md5 bucket — the seed of
               every split/sample operator)
"""

from sample_dms_s3_kinesis_spark.operators.dedup import (
    cosine_similarity,
    minhash_signature,
    token_ngrams,
)
from sample_dms_s3_kinesis_spark.operators.sampling import hash_bucket
from sample_dms_s3_kinesis_spark.operators.similarity import hyperplane_signature
from sample_dms_s3_kinesis_spark.operators.text import (
    avg_token_len,
    bpe_ish_token_count,
    bpe_ish_tokens,
    char_count,
    fingerprint,
    lang_id,
    punct_count,
    rolling_hashes,
    stopword_count,
    token_count,
    tokens,
)

__all__ = [
    "avg_token_len",
    "bpe_ish_token_count",
    "bpe_ish_tokens",
    "char_count",
    "cosine_similarity",
    "fingerprint",
    "hash_bucket",
    "hyperplane_signature",
    "lang_id",
    "minhash_signature",
    "punct_count",
    "rolling_hashes",
    "stopword_count",
    "token_count",
    "token_ngrams",
    "tokens",
]
