"""Z-order (Morton-curve) data layout for multi-dimensional file
pruning.

A 100 TB table can be SORTED by only one key: point/range predicates on
that key skip almost every file via parquet min/max footer stats, but
predicates on any other column hit every file. Z-ordering (the
Delta/Iceberg `OPTIMIZE ZORDER BY` idea) interleaves the bits of
several columns' rank-space positions into one clustering key, so each
file covers a small HYPERCUBE of the value space — predicates on ANY
of the z-columns prune most files, at the cost of each single column
pruning somewhat less tightly than a dedicated sort.

Spark-first shape (mirrors Delta OSS's range_partition_id approach but
stays in one pass):

* ONE multi-column `approxQuantile` driver pass (GK sketches for every
  z-column in a single scan — never a shuffle, never a collect of data
  rows) learns ``knots + 1`` equi-depth CDF knots per column.
* Scan-stage, each value maps to rank space by piecewise-linear
  interpolation between its two knots — a fold over ≤ 33 literal
  knots, pure Catalyst, whole-stage-codegen friendly — then to an
  integer bucket in ``[0, 2^bits)``. Equi-depth (not equi-width)
  bucketing is what keeps skewed columns from collapsing into one
  z-stripe.
* The z-value interleaves the bucket bits (a constant-folded sum of
  shift/mask terms), and ONE `repartitionByRange` + per-file sort
  writes files whose z-ranges are disjoint and whose per-column
  min/max footer stats are tight.

The pruning payoff is mechanical, not statistical, so
:func:`file_pruning_fraction` measures it directly from parquet
footers: the fraction of files whose [min, max] for a column can
contain a probe value — what a row-group-level predicate-pushdown scan
must actually read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_value",
    "write_zordered",
    "file_pruning_fraction",
    "clustering_decay",
    "clustering_decay_all",
    "maintain_zorder",
    "append_zordered_store",
]


def _cdf_bucket(col: Column, edges: list[float], bits: int) -> Column:
    """Equi-depth bucket of ``col`` in [0, 2^bits): piecewise-linear
    interpolation of the empirical CDF between quantile knots, then a
    floor to the bucket grid. NULLs land in bucket 0 (they cluster
    together at the curve origin, matching NULLS FIRST layouts)."""
    n_seg = len(edges) - 1
    lo, hi = edges[0], edges[-1]
    v = col.cast("double")
    # fold over the interior knots: seg = #knots below v; frac = linear
    # position inside that segment. Knot arrays are ≤ 33 literals, so
    # the fold is constant-size per row and codegen-friendly.
    knots = F.array(*[F.lit(float(e)) for e in edges])
    if n_seg > 1:
        seg = F.aggregate(
            F.slice(knots, 2, n_seg - 1),
            F.lit(0),
            lambda acc, e: acc + F.when(v >= e, 1).otherwise(0),
        )
    else:
        seg = F.lit(0)
    seg_lo = F.element_at(knots, seg + 1)
    seg_hi = F.element_at(knots, seg + 2)
    width = seg_hi - seg_lo
    frac = F.when(width > 0, (v - seg_lo) / width).otherwise(F.lit(0.0))
    rank = (seg.cast("double") + F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))) / F.lit(
        float(n_seg)
    )
    clamped = F.when(v <= lo, F.lit(0.0)).otherwise(
        F.when(v >= hi, F.lit(1.0)).otherwise(rank)
    )
    bucket = F.least(
        F.floor(clamped * F.lit(float(1 << bits))).cast("long"),
        F.lit((1 << bits) - 1),
    )
    return F.coalesce(bucket, F.lit(0))


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    knots: int = 32,
    relative_error: float = 0.001,
) -> Column:
    """The Morton z-value column for ``cols`` over ``df``'s distribution:
    per-column equi-depth buckets (``bits`` bits each, CDF knots from
    ONE bounded multi-column ``approxQuantile`` pass) with bits
    interleaved column-major — two rows are z-close iff they are close
    in EVERY column's rank space. Timestamps and numerics both work
    (timestamps bucket on their epoch seconds); the returned expression
    is pure Catalyst.

    ``bits * len(cols)`` must fit a long (≤ 62); the default 12 bits ×
    up to 5 columns leaves file counts up to 4096 per dimension —
    plenty, since the z-value only needs enough resolution to separate
    FILES, not rows."""
    if not cols:
        raise ValueError("zorder_value: need at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder_value: {bits} bits × {len(cols)} cols exceeds a "
            "long — lower bits (file-level clustering rarely needs "
            "more than 12)"
        )
    from pyspark.sql.types import DateType, TimestampType

    def _as_double(c: str) -> Column:
        if isinstance(df.schema[c].dataType, (TimestampType, DateType)):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    numeric = df.select(*[_as_double(c).alias(c) for c in cols])
    qs = [i / knots for i in range(knots + 1)]
    # ONE multi-column GK pass: approxQuantile sketches every z-column
    # in a single scan — per-column calls would re-read the table
    # len(cols) times at compaction cadence
    all_edges = numeric.approxQuantile(cols, qs, relative_error)
    buckets = []
    for c, edges in zip(cols, all_edges):
        # collapse duplicate knots (heavy ties) — _cdf_bucket needs a
        # monotone knot sequence; ties just shorten the piecewise CDF
        dedup = [edges[0]] if edges else []
        for e in edges[1:]:
            if e > dedup[-1]:
                dedup.append(e)
        if len(dedup) < 2:  # constant or empty column: one z-stripe
            buckets.append(F.lit(0).cast("long"))
            continue
        buckets.append(_cdf_bucket(_as_double(c), dedup, bits))
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1)),
                    j * len(buckets) + i,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    files: int = 32,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` into ``files`` parquet files clustered on the
    z-curve of ``cols``: ONE ``repartitionByRange`` on the z-value
    (range boundaries from Spark's own reservoir sample) + a per-file
    sort, so consecutive files hold disjoint z-ranges and every file's
    per-column min/max footer stats cover a small hypercube. The
    z-value is layout scaffolding and is not persisted.

    This is the layout-maintenance twin of ``storage.compact`` for
    multi-predicate tables: run it at compaction cadence; readers need
    nothing special (plain parquet scans get file/row-group skipping
    from the ordinary parquet filter pushdown)."""
    z = zorder_value(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def _leaf_index(md, col: str) -> int:
    """Parquet LEAF-column index of ``col`` — NOT the Arrow top-level
    field index (a struct column before ``col`` would shift every leaf,
    so get_field_index would silently read the wrong column's stats on
    nested schemas). Resolved from the schema's leaf paths, so it works
    on files with zero row groups too; raises a named error instead of
    pyarrow's bare IndexError for a typo'd column."""
    leaves = list(md.schema.names)
    try:
        return leaves.index(col)
    except ValueError:
        raise ValueError(
            f"column {col!r} not found among parquet leaves {leaves}"
        ) from None


def _file_spans(path: str, cols: list[str]) -> list[dict]:
    """ONE footer pass per file collecting every requested column's
    [min, max] (or None when any row group lacks stats): the shared
    metadata read behind :func:`file_pruning_fraction` and
    :func:`clustering_decay`, so an N-column maintenance check costs
    one ParquetFile open per file, not N — on an object store each
    open is a round trip.

    Listing and opens go through ``pyarrow.fs`` resolved FROM THE PATH
    (``file://``, ``s3://``, ``hdfs://`` — the same stores
    ``publish_generation`` targets), not ``os.walk``, which would
    silently walk the DRIVER's local disk for any remote scheme and
    report 'no parquet files' for a perfectly healthy table (r9 advice
    #1). Footer-stats maintenance is driver-side by design (metadata,
    not data); the store scheme must not change that."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    if "://" in path or path.startswith("file:"):
        fs, root = pafs.FileSystem.from_uri(path)
    else:
        fs, root = pafs.LocalFileSystem(), path
    infos = fs.get_file_info(
        pafs.FileSelector(root, recursive=True, allow_not_found=True)
    )
    paths = sorted(
        i.path
        for i in infos
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )
    if not paths:
        raise ValueError(f"no parquet files at {path}")
    out = []
    for p in paths:
        with fs.open_input_file(p) as f:
            md = pq.ParquetFile(f).metadata
        if md.num_row_groups == 0:
            # empty part file (range partitioning can emit them): it
            # holds no rows, so it neither costs a predicate anything
            # nor overlaps anything — counting it as "must read" would
            # make a freshly z-ordered table measure as decayed and
            # could trip maintain_zorder into pointless rewrites
            continue
        spans = {}
        for col in cols:
            idx = _leaf_index(md, col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans[col] = None if lo is None else (lo, hi)
        out.append(spans)
    if not out:  # every file empty: nothing to read, nothing overlaps
        return []
    return out


def file_pruning_fraction(path: str, col: str, value) -> float:
    """The fraction of parquet files under ``path`` a point predicate
    ``col = value`` must READ: files whose footer [min, max] for
    ``col`` contains the value (what row-group predicate pushdown
    cannot skip). Driver-side footer metadata only — no data pages.
    The honest pruning metric for layout tests and maintenance
    telemetry: 1.0 means the layout gives this predicate nothing."""
    hit = 0
    spans = _file_spans(path, [col])
    if not spans:
        return 0.0  # only empty part files: the scan reads no data
    for s in spans:
        span = s[col]
        if span is None:  # no stats → the scan must read the file
            hit += 1
        elif span[0] <= value <= span[1]:
            hit += 1
    return hit / len(spans)


def clustering_decay(path: str, col: str) -> float:
    """How decayed ``col``'s file clustering is at ``path``: the mean,
    over files, of the fraction of OTHER files whose [min, max] contains
    this file's midpoint — i.e. what share of the table a typical point
    predicate still has to read. A fresh single-column sort scores ~0
    (disjoint ranges); fully interleaved appends score ~1. Driver-side
    parquet-footer metadata only, like :func:`file_pruning_fraction` —
    the maintenance trigger must be far cheaper than the rewrite it
    gates. Files without stats count as overlapping (the scan cannot
    skip them). Returns 0.0 for a single file (nothing to prune
    between).

    The metric counts EXCESS overlap only: a degenerate single-value
    file (``min == max``) never counts as overlapping another file's
    midpoint. Under heavy key skew (the crawl mega-domain shape —
    90% of rows under one key) a perfectly clustered layout is mostly
    pure hot-key files; those files mutually "overlap" at the hot
    value, but reading them for a hot-key predicate is the unavoidable
    floor NO layout can shrink — counting them would make a fresh
    skewed table measure decayed and send ``maintain_zorder`` into an
    infinite rewrite loop (pinned in ``tests/test_layout.py``). Wide
    files are what a rewrite can actually fix, so they are what the
    trigger watches.

    Multi-column checks should go through :func:`clustering_decay_all`
    — one footer pass for every column instead of N."""
    return clustering_decay_all(path, [col])[col]


def clustering_decay_all(path: str, cols: list[str]) -> dict[str, float]:
    """Per-column :func:`clustering_decay` from ONE footer pass
    (:func:`_file_spans`) — the shape ``maintain_zorder`` uses, for the
    same reason ``zorder_value`` sketches all columns in one
    ``approxQuantile`` call: the trigger must stay far cheaper than the
    rewrite, and on an object store each footer open is a round
    trip."""
    file_spans = _file_spans(path, cols)
    out = {}
    for col in cols:
        spans = [s[col] for s in file_spans]
        if len(spans) <= 1:
            out[col] = 0.0
            continue
        total = 0.0
        for i, s in enumerate(spans):
            if s is None:
                total += 1.0  # statless file: nothing prunes against it
                continue
            try:
                mid = s[0] + (s[1] - s[0]) / 2
            except TypeError:  # non-numeric (e.g. string) stats: use min
                mid = s[0]
            # excess overlap only: a degenerate [v, v] file is the
            # unavoidable floor for value v (see docstring's skew
            # note), so only statless and WIDE files count against
            # the layout
            hits = sum(
                1
                for j, o in enumerate(spans)
                if j != i
                and (o is None or (o[0] <= mid <= o[1] and o[0] < o[1]))
            )
            total += hits / (len(spans) - 1)
        out[col] = total / len(spans)
    return out


def maintain_zorder(
    spark,
    root: str,
    cols: list[str],
    decay_threshold: float = 0.5,
    files: int = 32,
    bits: int = 12,
    keep: int = 1,
) -> bool:
    """The layout twin of ``maintain_ivf_index``: measure → threshold →
    rewrite. Appends land wherever the writer put them, so a z-ordered
    table's file ranges decay toward full overlap and point predicates
    stop pruning; this reads the live generation's footers
    (:func:`clustering_decay`, driver-side metadata only), and only
    past ``decay_threshold`` on some z-column re-clusters the table
    with :func:`write_zordered` into a new generation and flips the
    pointer (object-store-safe, crash leaves the live table untouched,
    readers keep their snapshot). A healthy table costs footer reads
    and does NOTHING. Returns whether a rewrite ran.

    Appends between the decay read and the publish survive: they
    landed in the pre-swap generation, which outlives this publish as
    the grace snapshot — re-appending deltas is the caller's idiom
    when needed (the IVF rebalance carry), but a layout rewrite is
    usually scheduled against a quiesced table at compaction cadence."""
    from connect_server_spark.fsutil import (
        begin_generation,
        publish_generation,
        resolve_store,
    )

    live = resolve_store(spark, root)
    decay = clustering_decay_all(live, cols)  # one footer pass, N cols
    if all(decay[c] <= decay_threshold for c in cols):
        return False
    df = spark.read.parquet(live)
    gen = begin_generation(spark, root)
    write_zordered(df, gen, cols, files=files, bits=bits)
    publish_generation(spark, root, gen, keep=keep)
    return True


def append_zordered_store(df: DataFrame, root: str) -> None:
    """Append rows to a (possibly generation-pointered) z-ordered table:
    resolves ``_CURRENT`` first so the rows land INSIDE the live
    generation — a naive ``.write.mode("append").parquet(root)`` after
    the first :func:`maintain_zorder` publish would drop flat files
    beside the generation dirs, invisible to every resolving reader and
    deleted as pre-upgrade legacy by the next publish. (Same contract
    as ``write_bucketed_path(mode="append")`` and
    ``write_ivf_index(mode="append")``.) Appends are NOT re-clustered —
    they decay the layout by design, and :func:`maintain_zorder` is the
    cadence that restores it."""
    from connect_server_spark.fsutil import append_resolved

    append_resolved(df, root)
