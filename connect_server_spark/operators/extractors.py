"""Metadata-extractor framework (SURVEY §2: S14, F15, F16, F17).

The reference's legacy processor package maps raw files to structured
records per format (golden outputs ``tests/test_extractors.py:20-405``).
Re-expressed Spark-first:

* **Mapping extractors** (JSON/XML dot-path maps, F15) and **filename
  extractors** (regex maps, F16) are pure column expressions — they run
  in the scan stage.
* **Structured deserialization** (F17) uses ``from_json`` with explicit
  schemas — never ``eval`` (the reference's ``aws/submit.py:44-54`` used
  string-eval; the safe equivalent is part of the contract).
* **Binary formats** (CIF/TDB/images) go through an Arrow-batched
  ``mapInPandas`` plumbing whose decode step is a clearly-marked stub —
  the domain libraries aren't available here, but the schema, batch
  shape, and grouping are real (see ``operators/multimodal.py``).

Extraction over file *groups* (the reference groups by directory,
``aws/automate_manager.py:132``) is ``groupBy(dirname)`` + the per-format
extractor applied to each member, merged per group.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "json_extractor",
    "xml_extractor",
    "filename_extractor",
    "parse_json_column",
    "composition_elements",
    "anonymized_stoichiometry",
    "cell_volume",
    "tdb_extractor",
    "grouped_extract",
]


def parse_json_column(col: Column, schema: str | StructType) -> Column:
    """F17: schema-checked JSON deserialization (``from_json``; malformed
    input yields null fields, never arbitrary evaluation)."""
    return F.from_json(col, schema)


def json_extractor(
    df: DataFrame,
    json_col: str,
    schema: str | StructType,
    mapping: Mapping[str, str],
    na_values: tuple = (),
) -> DataFrame:
    """F15: dot-path mapping extractor over a JSON string column.

    ``mapping`` maps output column → dot path inside the parsed document
    (``tests/test_extractors.py:171-255``: ``{out: in_dot_path}`` with
    ``na_values`` dropped to null). Adds one output column per entry."""
    parsed = parse_json_column(F.col(json_col), schema)

    def resolve(path: str) -> Column:
        out: Column = parsed
        for part in path.split("."):
            out = out[part]
        return out

    out = df
    for out_col, path in mapping.items():
        val = resolve(path)
        for na in na_values:
            # compare on the string rendering: na_values apply across field
            # types, and ANSI mode forbids lossy cross-type casts
            val = F.when(
                val.cast("string") == F.lit(str(na)), F.lit(None)
            ).otherwise(val)
        out = out.withColumn(out_col, val)
    return out


def composition_elements(
    df: DataFrame, key_col: str, comp_col: str
) -> DataFrame:
    """Parse a chemical composition string into per-element total counts:
    ``(key, element, cnt)`` with repeated element tokens summed
    (``'FFO2'`` → F:2, O:2). Explode + groupBy — both stay map-side-light
    because the token rows are (key, 2-char symbol, long)."""
    toks = df.select(
        F.col(key_col),
        F.explode(
            F.regexp_extract_all(F.col(comp_col), F.lit(r"([A-Z][a-z]?[0-9]*)"), 1)
        ).alias("_tok"),
    ).select(
        F.col(key_col),
        F.regexp_extract("_tok", r"^([A-Za-z]+)", 1).alias("element"),
        F.coalesce(
            F.nullif(F.regexp_extract("_tok", r"([0-9]+)$", 1), F.lit("")),
            F.lit("1"),
        )
        .cast("long")
        .alias("cnt"),
    )
    return toks.groupBy(key_col, "element").agg(F.sum("cnt").alias("cnt"))


def stoichiometry_struct(comp: Column) -> Column:
    """Per-ROW anonymized stoichiometry: a struct
    ``(stoichiometry, number_of_atoms)`` computed entirely with array
    expressions — no explode, no shuffle, so a CIF extractor over 100 TB
    of compositions stays in the scan stage. Same semantics as
    :func:`anonymized_stoichiometry` (which groups exploded element rows
    and also feeds the A6 element-derivation path): repeated element
    tokens summed, counts GCD-reduced, sorted ascending, lettered A, B,
    C, … with count 1 omitted. Compositions have ≤ ~10 distinct
    elements, so the O(distinct × tokens) per-row fold is trivial."""
    from connect_server_spark.functions.expr import let_col

    toks = F.regexp_extract_all(comp, F.lit(r"([A-Z][a-z]?[0-9]*)"), 1)

    def elem(t: Column) -> Column:
        return F.regexp_extract(t, r"^([A-Za-z]+)", 1)

    def cnt(t: Column) -> Column:
        return F.coalesce(
            F.nullif(F.regexp_extract(t, r"([0-9]+)$", 1), F.lit("")),
            F.lit("1"),
        ).cast("long")

    def build(ts: Column) -> Column:
        # parse each token ONCE into (element, count); the distinct×tokens
        # summing fold then touches only parsed structs, never a regex
        pairs = F.transform(
            ts, lambda t: F.struct(elem(t).alias("e"), cnt(t).alias("c"))
        )

        def sum_counts(ps: Column) -> Column:
            per_elem = F.transform(
                F.array_distinct(F.transform(ps, lambda p: p["e"])),
                lambda e: F.aggregate(
                    ps,
                    F.lit(0).cast("long"),
                    lambda acc, p: acc
                    + F.when(p["e"] == e, p["c"]).otherwise(0),
                ),
            )
            return let_col(F.array_sort(per_elem), _stoich_from_counts)

        return let_col(pairs, sum_counts)

    return let_col(toks, build)


def _stoich_from_counts(counts: Column) -> Column:
    """(stoichiometry, number_of_atoms) from ascending per-element counts."""
    gcd = F.array_max(
        F.filter(
            F.sequence(F.lit(1).cast("long"), F.element_at(counts, 1)),
            lambda d: F.forall(counts, lambda c: c % d == 0),
        )
    )
    reduced = F.transform(counts, lambda c: (c / gcd).cast("long"))
    stoich = F.array_join(
        F.transform(
            reduced,
            lambda c, i: F.concat(
                F.char(F.lit(65) + i),
                F.when(c == 1, F.lit("")).otherwise(c.cast("string")),
            ),
        ),
        "",
    )
    atoms = F.aggregate(counts, F.lit(0).cast("long"), lambda a, c: a + c)
    return F.struct(
        stoich.alias("stoichiometry"), atoms.alias("number_of_atoms")
    )


def anonymized_stoichiometry(
    df: DataFrame, key_col: str, comp_col: str
) -> DataFrame:
    """F18: ``(key, stoichiometry, number_of_atoms)`` matching the
    reference CIF extractor's goldens
    (``tests/test_extractors.py:21-68``): per-element counts are reduced
    by their GCD, sorted ascending, lettered A, B, C, … with count 1
    omitted — ``'Ce24V8O128'`` → ``'AB3C16'``, atoms 160.

    GCD has no Catalyst builtin; for reduced-formula count ranges it is
    the largest d ≤ min(counts) dividing all, found by probing the
    (tiny) 1..min(counts) sequence."""
    per_key = composition_elements(df, key_col, comp_col).groupBy(key_col).agg(
        F.sum("cnt").alias("number_of_atoms"),
        F.array_sort(F.collect_list("cnt")).alias("_counts"),
    )
    counts = F.col("_counts")
    gcd = F.array_max(
        F.filter(
            F.sequence(F.lit(1).cast("long"), F.element_at(counts, 1)),
            lambda d: F.forall(counts, lambda c: c % d == 0),
        )
    )
    reduced = F.transform(counts, lambda c: (c / gcd).cast("long"))
    stoich = F.array_join(
        F.transform(
            reduced,
            lambda c, i: F.concat(
                F.char(F.lit(65) + i),
                F.when(c == 1, F.lit("")).otherwise(c.cast("string")),
            ),
        ),
        "",
    )
    return per_key.select(
        F.col(key_col), stoich.alias("stoichiometry"), F.col("number_of_atoms")
    )


def cell_volume(
    a: Column, b: Column, c: Column, alpha: Column, beta: Column, gamma: Column
) -> Column:
    """F18: triclinic unit-cell volume from lattice lengths (Å) and angles
    (degrees): ``abc·√(1 − cos²α − cos²β − cos²γ + 2·cosα·cosβ·cosγ)``.
    Pure double-precision expression — runs in the scan stage."""
    ca, cb, cg = (F.cos(F.radians(x)) for x in (alpha, beta, gamma))
    return (
        a * b * c
        * F.sqrt(1 - ca * ca - cb * cb - cg * cg + 2 * ca * cb * cg)
    )


def tdb_extractor(df: DataFrame, content_col: str) -> DataFrame:
    """S14 (CALPHAD .TDB): parse thermodynamic-database text into
    ``phases`` (upper-cased PHASE names, file order) and ``composition``
    (element symbols concatenated) — the record shape of the reference's
    ``extract_tdb`` goldens (``tests/test_extractors.py:78-144``).

    Pure regex expressions over the file text — runs in the scan stage,
    no Python boundary (the reference shells out to pycalphad; the parsed
    fields it keeps are line-anchored declarations, which regex covers).

    Semantics pinned to the goldens:

    * the electron-gas pseudo-element ``/-`` is excluded from the
      composition, the vacancy element ``VA`` is kept;
    * symbols render title-case (``PB`` → ``Pb``);
    * files with no PHASE and no ELEMENT declarations produce no record
      (``extract_tdb([NO_DATA_FILE]) == {}``) — such rows are dropped;
    * the reference emits composition in Python-set order
      (nondeterministic; its own golden compare is order-insensitive) —
      this engine sorts symbols for a deterministic, hashable result.
    """
    content = F.col(content_col)
    phases = F.regexp_extract_all(
        content, F.lit(r"(?m)^\s*PHASE\s+([A-Za-z0-9_]+)"), 1
    )
    raw_els = F.regexp_extract_all(
        content, F.lit(r"(?m)^\s*ELEMENT\s+([A-Za-z/\-]+)"), 1
    )
    symbols = F.transform(
        F.array_sort(
            F.array_distinct(F.filter(raw_els, lambda e: e != F.lit("/-")))
        ),
        lambda e: F.concat(
            F.upper(F.substring(e, 1, 1)), F.lower(F.substring(e, 2, 8))
        ),
    )
    return (
        df.withColumn("phases", F.transform(phases, F.upper))
        .withColumn("composition", F.array_join(symbols, ""))
        .filter((F.size("phases") > 0) | (F.col("composition") != ""))
    )


def xml_extractor(
    df: DataFrame,
    xml_col: str,
    schema: str | StructType,
    mapping: Mapping[str, str],
    na_values: tuple = (),
) -> DataFrame:
    """F15 (XML side): dot-path mapping extractor over an XML string
    column (``tests/test_extractors.py:276-337``), same mapping/na
    semantics as :func:`json_extractor` but deserialized with the native
    ``from_xml`` — schema-checked, never eval."""
    parsed = F.from_xml(F.col(xml_col), schema)

    def resolve(path: str) -> Column:
        out: Column = parsed
        for part in path.split("."):
            out = out[part]
        return out

    out = df
    for out_col, path in mapping.items():
        val = resolve(path)
        for na in na_values:
            val = F.when(
                val.cast("string") == F.lit(str(na)), F.lit(None)
            ).otherwise(val)
        out = out.withColumn(out_col, val)
    return out


def filename_extractor(
    df: DataFrame, filename_col: str, mapping: Mapping[str, str]
) -> DataFrame:
    """F16: regex mapping over filenames; a non-matching pattern yields
    null (the reference omits the field,
    ``tests/test_extractors.py:355-401``)."""
    out = df
    for out_col, pattern in mapping.items():
        extracted = F.regexp_extract(F.col(filename_col), pattern, 1)
        out = out.withColumn(
            out_col, F.when(extracted != "", extracted)
        )
    return out


def grouped_extract(df, group_col: str, extractors, schema):
    """S14/§2.10: the reference's per-directory extraction fan-in
    (``grouper: 'directory/matio'``, ``aws/automate_manager.py:132``) as a
    grouped-map pandas UDF: ``groupBy(group).applyInPandas``.

    ``extractors`` is an ordered list of callables, each mapping the
    group's pandas frame to a dict of output fields; results merge per
    group with first-writer-wins per key (the ``dict_merge`` analog —
    earlier extractors are more specific). One output row per group,
    typed by ``schema``.

    Scale: groups are processed independently after one shuffle on the
    group key; each Arrow batch holds whole groups, so a 1000-executor
    cluster runs every directory's extraction concurrently."""
    import pandas as _pd

    def run(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        rec: dict = {group_col: pdf[group_col].iloc[0]}
        for extract in extractors:
            out = extract(pdf) or {}
            for key, val in out.items():
                rec.setdefault(key, val)
        return _pd.DataFrame([rec])

    return df.groupBy(group_col).applyInPandas(run, schema)
