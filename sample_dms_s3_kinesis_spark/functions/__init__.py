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
               ``bpe_ish_tokens``, ``bpe_ish_token_count``,
               ``dup_token_fraction``, ``normalize_text``,
               ``redact_pii``, ``pii_count``, ``winnowed_fingerprints``
- shingling:   ``token_ngrams``, ``minhash_signature``, ``simhash``
- similarity:  ``cosine_similarity``, ``hyperplane_signature``,
               ``l2_norm``, ``l2_normalize``, ``dequantize``
- sampling:    ``hash_bucket`` (deterministic md5 bucket — the seed of
               every split/sample operator)
- curation:    ``gram_digest``
- layout:      ``zorder_key`` (Morton interleave clustering key)
"""

from sample_dms_s3_kinesis_spark.operators.curation import gram_digest
from sample_dms_s3_kinesis_spark.operators.dedup import (
    cosine_similarity,
    minhash_signature,
    simhash,
    token_ngrams,
)
from sample_dms_s3_kinesis_spark.operators.layout import zorder_key
from sample_dms_s3_kinesis_spark.operators.sampling import hash_bucket
from sample_dms_s3_kinesis_spark.operators.similarity import (
    dequantize,
    hyperplane_signature,
    l2_norm,
    l2_normalize,
)
from sample_dms_s3_kinesis_spark.operators.text import (
    avg_token_len,
    bpe_ish_token_count,
    bpe_ish_tokens,
    char_count,
    char_ngrams,
    detect_script,
    dup_token_fraction,
    fingerprint,
    html_followable_links,
    lang_id,
    lang_id_unicode,
    normalize_text,
    pii_count,
    punct_count,
    redact_pii,
    rolling_hashes,
    segment_tokens,
    stopword_count,
    token_count,
    tokens,
    winnowed_fingerprints,
)

__all__ = [
    "avg_token_len",
    "bpe_ish_token_count",
    "bpe_ish_tokens",
    "char_count",
    "char_ngrams",
    "cosine_similarity",
    "dequantize",
    "detect_script",
    "dup_token_fraction",
    "fingerprint",
    "gram_digest",
    "hash_bucket",
    "html_followable_links",
    "hyperplane_signature",
    "l2_norm",
    "l2_normalize",
    "lang_id",
    "lang_id_unicode",
    "minhash_signature",
    "normalize_text",
    "pii_count",
    "punct_count",
    "redact_pii",
    "rolling_hashes",
    "segment_tokens",
    "simhash",
    "stopword_count",
    "token_count",
    "token_ngrams",
    "tokens",
    "winnowed_fingerprints",
    "zorder_key",
]
