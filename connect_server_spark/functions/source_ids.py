"""Source-id / version column expressions.

Pure Catalyst expressions (no Python UDFs) re-expressing the reference's
source-id string pipeline — ``aws/source_id_manager.py:40-191`` — and the
version arithmetic in ``aws/dynamo_manager.py:60-100``. Goldens:
``tests/test_utils.py:5-119``, ``aws/tests/test_dynamo_manager.py:7-70``.

Staying in expressions keeps the whole pipeline inside whole-stage codegen;
at 100 TB these run in the scan stage with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "DELETE_WORDS",
    "split_source_id",
    "make_source_name",
    "increment_record_version",
    "version_sort_key",
]

# Stopwords removed from titles (aws/source_id_manager.py:15-35).
DELETE_WORDS = (
    "a", "an", "and", "as", "data", "dataset", "for", "from", "in", "of",
    "or", "study", "test", "that", "the", "this", "to", "very", "with",
)

_VERSION_SUFFIX = r"_v[0-9]+\.[0-9]+$"
_VERSION_GROUPS = r"_v([0-9]+)\.([0-9]+)$"


from connect_server_spark.functions.expr import let_col as _let


def split_source_id(source_id: Column) -> Column:
    """``{source_name}_v{search}.{sub}`` → struct(success, source_name,
    source_id, search_version, submission_version).

    Invalid-form ids keep the whole string as name/id with versions 0
    (``aws/source_id_manager.py:40-78``). The reference reassembles the
    source_id from the raw matched substrings, so the assembled id always
    equals the input when the form matches (zero padding preserved:
    ``x_v08.1`` stays ``x_v08.1``); only the version *fields* are int-cast.
    """
    matched = source_id.rlike(_VERSION_SUFFIX)
    name = F.regexp_replace(source_id, _VERSION_SUFFIX, "")
    search_v = F.regexp_extract(source_id, _VERSION_GROUPS, 1).cast("int")
    sub_v = F.regexp_extract(source_id, _VERSION_GROUPS, 2).cast("int")
    return F.struct(
        matched.alias("success"),
        F.when(matched, name).otherwise(source_id).alias("source_name"),
        source_id.alias("source_id"),
        F.when(matched, search_v).otherwise(F.lit(0)).alias("search_version"),
        F.when(matched, sub_v).otherwise(F.lit(0)).alias("submission_version"),
    )


def _clean_tokens(value: Column) -> Column:
    """Tokenize on space/underscore, lowercase, keep ASCII alnum chars only,
    drop empties and stopwords (``aws/source_id_manager.py:146-155``; the
    reference keeps ``char.isalnum() and char.isascii()`` — ASCII only, so
    ``Überstudy`` → ``berstudy``)."""
    tokens = F.split(F.translate(value, "_", " "), r"\s+")
    cleaned = F.transform(
        tokens, lambda t: F.regexp_replace(F.lower(t), r"[^a-z0-9]", "")
    )
    stop = F.array(*[F.lit(w) for w in DELETE_WORDS])
    return F.filter(
        cleaned, lambda t: (t != "") & ~F.array_contains(stop, t)
    )


def _author_word(author: Column) -> Column:
    """Author tokens cleaned and merged into one word
    (``aws/source_id_manager.py:157-163``) — stopwords are NOT dropped from
    the author, only non-ASCII-alnum chars."""
    tokens = F.split(F.translate(author, "_", " "), r"\s+")
    cleaned = F.transform(
        tokens, lambda t: F.regexp_replace(F.lower(t), r"[^a-z0-9]", "")
    )
    return F.array_join(cleaned, "")


def make_source_name(
    title: Column,
    author: Column,
    is_test: Column | bool = False,
    sanitize_only: Column | bool = False,
) -> Column:
    """``make_source_id``'s name pipeline (``aws/source_id_manager.py:131-191``)
    → struct(success, source_name, error).

    Steps: strip any trailing ``_v{x}.{y}`` → tokenize/clean title → drop all
    occurrences of the merged author word (unless sanitize_only) → take
    first word, second word, last word → ``author_w1_w2_w3`` stripped of
    underscores → ``_test_`` prefix if test. A title with no usable word is
    an error row (the reference raises ValueError).

    Idempotent: running on its own output yields itself (golden
    ``tests/test_utils.py:60-70``).
    """
    if isinstance(is_test, bool):
        is_test = F.lit(is_test)
    if isinstance(sanitize_only, bool):
        sanitize_only = F.lit(sanitize_only)

    base_title = split_source_id(title)["source_name"]

    def with_author(author_word: Column) -> Column:
        cleaned = _clean_tokens(base_title)
        return _let(
            F.when(sanitize_only | (author_word == ""), cleaned).otherwise(
                F.filter(cleaned, lambda t: t != author_word)
            ),
            lambda toks: with_tokens(author_word, toks),
        )

    def with_tokens(author_word: Column, toks: Column) -> Column:
        n = F.size(toks)
        word1 = F.element_at(toks, 1)
        word2 = F.when(n >= 2, F.element_at(toks, 2)).otherwise(F.lit(""))
        word3 = F.when(n >= 3, F.element_at(toks, -1)).otherwise(F.lit(""))

        assembled = F.when(
            sanitize_only, F.array_join(toks, "_")
        ).otherwise(F.concat_ws("_", author_word, word1, word2, word3))
        # strip("_") — leading underscore when author_word is empty, trailing
        # when word2/word3 are (aws/source_id_manager.py:184).
        stripped = F.regexp_replace(
            F.regexp_replace(assembled, "^_+", ""), "_+$", ""
        )
        named = F.when(is_test, F.concat(F.lit("_test_"), stripped)).otherwise(stripped)

        ok = n >= 1
        return F.struct(
            ok.alias("success"),
            F.when(ok, named).otherwise(F.lit(None)).alias("source_name"),
            F.when(ok, F.lit(None)).otherwise(
                F.concat(
                    F.lit("Title '"), title,
                    F.lit("' invalid: Must have at least one word that is not the author name"),
                )
            ).alias("error"),
        )

    return _let(_author_word(author), with_author)


def increment_record_version(version: Column) -> Column:
    """``None/'' → '1.0'``; ``'{major}.{minor}' → '{major}.{minor+1}'``;
    anything unsplittable → null (``aws/dynamo_manager.py:90-100``,
    goldens ``aws/tests/test_dynamo_manager.py:66-70``). The major part is
    passed through verbatim (may be non-numeric), only the minor must parse."""
    def bump(parts: Column) -> Column:
        valid = (F.size(parts) == 2) & F.element_at(parts, 2).rlike("^[0-9]+$")
        return F.when(
            valid,
            F.concat(
                F.element_at(parts, 1),
                F.lit("."),
                (F.element_at(parts, 2).cast("long") + 1).cast("string"),
            ),
        ).otherwise(F.lit(None))

    return F.when(
        version.isNull() | (version == ""), F.lit("1.0")
    ).otherwise(_let(F.split(version, r"\.", -1), bump))


def version_sort_key(version: Column) -> Column:
    """Numeric-aware dotted-version sort key: ``'1.13' > '1.2'``
    (``aws/dynamo_manager.py:83-88``; trap set
    ``aws/tests/test_dynamo_manager.py:13-44``).

    Array<long> compares lexicographically element-wise in Spark ordering,
    matching Python's ``[int(i) for i in v.split('.')]`` list compare for
    all-numeric segments (the only kind the status table holds).
    """
    return F.transform(F.split(version, r"\."), lambda x: x.cast("long"))
