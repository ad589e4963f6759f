"""Arrow-native parquet datasource: Spark scans AND writes object-store
parquet through ``pyarrow.fs`` — no Hadoop connector on the classpath.

Why this exists: Spark's own parquet reader routes through the Hadoop
FileSystem, so an ``s3://`` / ``gs://`` corpus needs ``hadoop-aws`` (or
the GCS connector) mounted JVM-side. Many deployments — and this
container — don't have it. PySpark 4's Python DataSource API
(SPARK-44076) lets the scan itself run on pyarrow, the SAME library the
repo's control plane (``fsutil``) already uses for those schemes, which
turns SCALE.md's last "argued" object-store leg (Spark's own parquet
scans) into a measured one: ``tests/test_objectstore.py`` drives this
source end-to-end against a live S3 API.

Contracts, each load-bearing at 100 TB:

* **Filter pushdown is real** (``DataSourceReader.pushFilters``,
  SPARK-4.1): flat-column comparisons/IN/null-tests/string-matches are
  consumed by the source. They prune twice — DRIVER-side, whole row
  groups are dropped on parquet footer min/max stats before any task
  launches (the same skip Spark's native scan gets from
  ``PushedFilters``); EXECUTOR-side, pyarrow evaluates the expression
  exactly, so consumed filters are row-accurate, not best-effort, and
  Spark does not re-evaluate them.
* **Column pruning is explicit.** The 4.1 Python DS API has no
  required-columns push, so ``option("columns", "a,b")`` declares the
  projection; the scanner then never materializes the wide text/binary
  payload columns a 2-column aggregate doesn't need. (Omitting it reads
  the full schema — correct, but at corpus scale you always pass it.)
* **Partitions follow row groups, not files.** Each input partition is
  (file, row-group ids) packed to ``max_partition_bytes`` (default
  128 MiB), so a giant shard still fans out and a thousand tiny shards
  don't each pay task overhead for a 4 KB read. Batches stream out as
  Arrow ``RecordBatch`` (the zero-copy fast path added for Python
  sources) — nothing row-at-a-time anywhere.
* **Writes are manifest-committed** (the Iceberg/Delta idea, minimum
  viable form): each task buffers its batches, writes ONE uuid-named
  part per ~``max_rows_per_part`` rows via a single-request PUT (for a
  fully-buffered bounded part a single PUT beats multipart: one
  request, atomic visibility, no abort litter; 5 GB is the documented
  single-PUT ceiling and parts are sized far below it), and the driver
  commits by writing ``_MANIFEST`` LAST — an atomic whole-object
  replace. Readers honor the manifest when present, so a crashed or
  aborted job's orphan parts are INVISIBLE, never half-read; rename —
  which object stores fake as copy+delete — is never used.
* **Credentials/endpooint travel as options, not ambient env.**
  Executors don't inherit the driver's late env mutations (the JVM
  snapshots env at launch), so ``endpoint_url`` / ``access_key`` /
  ``secret_key`` / ``region`` ride the (picklable) reader itself —
  also the only workable shape for on-prem S3 gateways.

Reference parity: the reference service reads submission payloads from
S3 via boto3 (`/root/reference/aws/submissions.py`,
`utils.py:download_file`); this source is the Spark-native,
cluster-parallel form of that access path.
"""

from __future__ import annotations

import io
import json
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = [
    "ArrowParquetDataSource",
    "register_arrow_parquet",
    "read_arrow_parquet",
    "UpstreamOverwrittenError",
    "MANIFEST_NAME",
]

MANIFEST_NAME = "_MANIFEST"
_DEFAULT_MAX_PARTITION_BYTES = 128 << 20
_DEFAULT_MAX_ROWS_PER_PART = 1 << 20
_DEFAULT_BATCH_SIZE = 1 << 16


# ---------------------------------------------------------------------------
# filesystem resolution (picklable spec → pyarrow FileSystem)


@dataclass(frozen=True)
class _FsSpec:
    """Everything an executor needs to reopen the filesystem — plain
    strings, so the reader/writer stay picklable."""

    path: str
    endpoint_url: str | None = None
    access_key: str | None = None
    secret_key: str | None = None
    region: str | None = None

    @staticmethod
    def from_options(path: str, options) -> "_FsSpec":
        return _FsSpec(
            path=path,
            endpoint_url=options.get("endpoint_url") or None,
            access_key=options.get("access_key") or None,
            secret_key=options.get("secret_key") or None,
            region=options.get("region") or None,
        )

    def resolve(self):
        """(pyarrow FileSystem, fs-relative root path)."""
        import pyarrow.fs as pafs

        scheme = self.path.split("://", 1)[0] if "://" in self.path else ""
        if scheme == "s3" and (self.endpoint_url or self.access_key):
            kwargs = {}
            if self.endpoint_url:
                kwargs["endpoint_override"] = self.endpoint_url
                if self.endpoint_url.startswith("http://"):
                    kwargs["scheme"] = "http"
            if self.access_key:
                kwargs["access_key"] = self.access_key
                kwargs["secret_key"] = self.secret_key
            if self.region:
                kwargs["region"] = self.region
            fs = pafs.S3FileSystem(**kwargs)
            return fs, self.path.split("://", 1)[1]
        if "://" in self.path:
            return pafs.FileSystem.from_uri(self.path)
        return pafs.LocalFileSystem(), self.path

    def child(self, name: str) -> str:
        _, root = self.resolve()
        return f"{root.rstrip('/')}/{name}"


def _put_bytes(spec: _FsSpec, rel_path: str, payload: bytes) -> None:
    """Single-request whole-object PUT. On S3 this goes through boto3
    (one ``PutObject`` — atomic, no multipart to abort, and immune to
    the multipart-shape incompatibilities endpoint-override gateways
    show); elsewhere through the pyarrow stream, whose close is the
    store's own atomic finalize."""
    scheme = spec.path.split("://", 1)[0] if "://" in spec.path else ""
    if scheme == "s3":
        try:
            import boto3
        except ImportError:
            boto3 = None
        if boto3 is not None:
            bucket, _, key = rel_path.partition("/")
            kwargs = {}
            if spec.endpoint_url:
                kwargs["endpoint_url"] = spec.endpoint_url
            if spec.access_key:
                kwargs["aws_access_key_id"] = spec.access_key
                kwargs["aws_secret_access_key"] = spec.secret_key
            if spec.region:
                kwargs["region_name"] = spec.region
            boto3.client("s3", **kwargs).put_object(
                Bucket=bucket, Key=key, Body=payload
            )
            return
    fs, _ = spec.resolve()
    parent = rel_path.rsplit("/", 1)[0]
    if parent:
        # real filesystems need the parent to exist; on object stores
        # directories are implicit and this is a cheap no-op/marker
        fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(rel_path) as out:
        out.write(payload)


# ---------------------------------------------------------------------------
# filter translation: Spark Filter → picklable spec → pyarrow Expression


def _translate_filter(f: Filter):
    """One pushable filter → ("op", col, value) or None (stays with
    Spark). Only flat single-column references push; ``a.b.c`` and
    anything compound stays JVM-side — correctness first, the source
    just loses a pruning opportunity."""
    if isinstance(f, Not):
        inner = f.child
        if isinstance(inner, EqualTo) and len(inner.attribute) == 1:
            return ("ne", inner.attribute[0], inner.value)
        return None
    if not hasattr(f, "attribute") or len(f.attribute) != 1:
        return None
    col = f.attribute[0]
    if isinstance(f, EqualTo):
        return ("eq", col, f.value)
    if isinstance(f, GreaterThan):
        return ("gt", col, f.value)
    if isinstance(f, GreaterThanOrEqual):
        return ("ge", col, f.value)
    if isinstance(f, LessThan):
        return ("lt", col, f.value)
    if isinstance(f, LessThanOrEqual):
        return ("le", col, f.value)
    if isinstance(f, In):
        return ("in", col, tuple(f.value))
    if isinstance(f, IsNull):
        return ("isnull", col, None)
    if isinstance(f, IsNotNull):
        return ("notnull", col, None)
    if isinstance(f, StringStartsWith):
        return ("startswith", col, f.value)
    if isinstance(f, StringEndsWith):
        return ("endswith", col, f.value)
    if isinstance(f, StringContains):
        return ("contains", col, f.value)
    return None


def _specs_to_expression(specs):
    """AND-fold the translated specs into one pyarrow dataset
    Expression (None when nothing pushed). Null semantics match SQL's:
    a comparison against null is null and the row drops, exactly what
    Spark's post-scan filter would have done."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    expr = None
    for op, col, val in specs:
        field = pads.field(col)
        if op == "eq":
            e = field == val
        elif op == "ne":
            e = field != val
        elif op == "gt":
            e = field > val
        elif op == "ge":
            e = field >= val
        elif op == "lt":
            e = field < val
        elif op == "le":
            e = field <= val
        elif op == "in":
            e = field.isin(list(val))
        elif op == "isnull":
            e = field.is_null()
        elif op == "notnull":
            e = ~field.is_null()
        elif op == "startswith":
            e = pc.starts_with(field, pattern=val)
        elif op == "endswith":
            e = pc.ends_with(field, pattern=val)
        else:
            e = pc.match_substring(field, pattern=val)
        expr = e if expr is None else expr & e
    return expr


def _group_may_match(specs, stats) -> bool:
    """Conservative footer-stats check: False ONLY when a pushed spec
    provably excludes the whole row group. Missing stats, missing
    columns, or any comparison surprise (mixed tz datetimes, bytes vs
    str mins) keep the group — pruning is an optimization, never a
    correctness lever."""
    for op, col, val in specs:
        st = stats.get(col) if stats else None
        if not st or "min" not in st or "max" not in st:
            continue
        lo, hi = st["min"], st["max"]
        if lo is None or hi is None or val is None:
            continue
        try:
            if op == "eq" and (val < lo or val > hi):
                return False
            if op == "gt" and hi <= val:
                return False
            if op == "ge" and hi < val:
                return False
            if op == "lt" and lo >= val:
                return False
            if op == "le" and lo > val:
                return False
            if op == "in" and all(v is None or v < lo or v > hi for v in val):
                return False
        except TypeError:
            continue
    return True


# ---------------------------------------------------------------------------
# discovery: manifest-aware file listing


def _discover_files(spec: _FsSpec) -> list[str]:
    """fs-relative parquet file paths under the spec's root. A
    ``_MANIFEST`` (written by this source's writer) is authoritative:
    only its parts are visible, so uncommitted/aborted orphans never
    leak into a scan. Otherwise: the root itself if it's a file, else
    every ``*.parquet`` child."""
    import pyarrow.fs as pafs

    fs, root = spec.resolve()
    root = root.rstrip("/")
    manifest = f"{root}/{MANIFEST_NAME}"
    if fs.get_file_info(manifest).type == pafs.FileType.File:
        with fs.open_input_stream(manifest) as stream:
            doc = json.loads(stream.read().decode("utf-8"))
        return [f"{root}/{name}" for name in doc["parts"]]
    info = fs.get_file_info(root)
    if info.type == pafs.FileType.File:
        return [root]
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(spec.path)
    infos = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    return sorted(
        i.path
        for i in infos
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )


def _arrow_schema(
    spec: _FsSpec, columns: list[str] | None, files: list[str] | None = None
):
    """Unified arrow schema of the discovered files (one footer read),
    projected to ``columns`` when given — the driver-side half of
    explicit column pruning. Pass ``files`` to reuse an existing
    listing snapshot instead of re-listing."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    fs, _ = spec.resolve()
    ds = pads.dataset(
        files if files is not None else _discover_files(spec),
        filesystem=fs,
        format="parquet",
    )
    schema = ds.schema
    if columns:
        missing = [c for c in columns if schema.field(c) is None]
        if missing:  # pragma: no cover — field() raises first
            raise KeyError(missing)
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


# ---------------------------------------------------------------------------
# reader


@dataclass
class _RowGroupChunk(InputPartition):
    path: str
    row_groups: "tuple[int, ...] | None"  # None = the whole file


class ArrowParquetReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("arrow_parquet: .load(path) is required")
        self._spec = _FsSpec.from_options(path, options)
        cols = options.get("columns", "")
        self._columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        self._max_bytes = int(
            options.get("max_partition_bytes", _DEFAULT_MAX_PARTITION_BYTES)
        )
        self._batch_size = int(options.get("batch_size", _DEFAULT_BATCH_SIZE))
        self._pushed: list[tuple] = []
        # ONE listing snapshot per reader: schema() and partitions()
        # must see the same file set, or a concurrent manifest swap
        # between the two would plan a scan against a store that no
        # longer matches the declared schema. (Reads racing an
        # overwrite's GC can still lose the files themselves — that is
        # the caller's retention decision, same caveat as any
        # immediate-GC manifest store.)
        self._files = _discover_files(self._spec)
        self._target_schema = _arrow_schema(
            self._spec, self._columns, self._files
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            spec = _translate_filter(f)
            if spec is None:
                yield f  # Spark keeps evaluating this one
            else:
                self._pushed.append(spec)

    def partitions(self) -> list[InputPartition]:
        import pyarrow.dataset as pads

        fs, _ = self._spec.resolve()
        ds = pads.dataset(self._files, filesystem=fs, format="parquet")
        chunks: list[_RowGroupChunk] = []
        for frag in ds.get_fragments():
            frag.ensure_complete_metadata()
            ids: list[int] = []
            size = 0
            for rg in frag.row_groups:
                if self._pushed and not _group_may_match(
                    self._pushed, rg.statistics
                ):
                    continue  # footer stats prove no row here can match
                ids.append(rg.id)
                size += rg.total_byte_size
                if size >= self._max_bytes:
                    chunks.append(_RowGroupChunk(frag.path, tuple(ids)))
                    ids, size = [], 0
            if ids:
                chunks.append(_RowGroupChunk(frag.path, tuple(ids)))
        # a fully-pruned scan still needs ≥1 (empty) partition: Spark
        # asserts a non-empty partition list for batch sources
        if not chunks:
            chunks.append(_RowGroupChunk("", ()))
        return chunks

    def read(self, partition: _RowGroupChunk):
        yield from _read_chunk(
            self._spec,
            partition,
            self._target_schema,
            self._pushed,
            self._batch_size,
        )


def _read_chunk(spec, partition, target_schema, pushed, batch_size):
    """Scan one (file, row groups) chunk — shared by the batch and
    streaming readers."""
    import pyarrow.dataset as pads

    if not partition.path:
        return
    fs, _ = spec.resolve()
    frag = pads.ParquetFileFormat().make_fragment(
        partition.path,
        filesystem=fs,
        row_groups=(
            list(partition.row_groups)
            if partition.row_groups is not None
            else None
        ),
    )
    scanner = pads.Scanner.from_fragment(
        frag,
        columns=[f.name for f in target_schema],
        filter=_specs_to_expression(pushed),
        batch_size=batch_size,
    )
    for batch in scanner.to_batches():
        if batch.schema != target_schema:
            batch = batch.cast(target_schema)
        yield batch


# ---------------------------------------------------------------------------
# streaming reader: incremental ingest of a manifest-committed store


class UpstreamOverwrittenError(RuntimeError):
    """The stream's next window references commits an overwrite
    replaced — the data is gone, so the stream refuses instead of
    silently skipping it. Restart the query with a fresh checkpoint
    (or ``starting="latest"``) once that is the intended outcome."""


class ArrowParquetStreamReader(DataSourceStreamReader):
    """Incremental tail of a manifest-committed store (the writer
    above): each batch reads exactly the parts whose ``part_seqs``
    entry falls in ``(start.seq, end.seq]`` — the Auto Loader idea with
    the ledger folded into the manifest itself.

    Why this is exactly-once BY CONSTRUCTION, with an O(1) offset: the
    writer's ``seq`` ticks once per atomic manifest swap and never
    reorders, a part's ``part_seqs`` entry never changes once committed
    (append mode only adds entries), and the offset Spark checkpoints
    is the single integer ``seq`` — replaying ``(start, end]`` after a
    crash lists the identical part set. No per-file ledger in the
    checkpoint, no mtime watermarks, no listing races. The flip side is
    honest too: this source tails stores written by THIS sink's commit
    protocol (or anything that maintains the same manifest contract) —
    tailing a foreign directory of bare files needs a side ledger
    (mtime watermarks cannot make replay deterministic) and is out of
    scope. An upstream ``mode("overwrite")`` bumps ``base_seq``; a
    stream holding an older offset raises
    :class:`UpstreamOverwrittenError` rather than skipping the gap.
    """

    def __init__(self, schema: StructType, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("arrow_parquet: .load(path) is required")
        self._spec = _FsSpec.from_options(path, options)
        cols = options.get("columns", "")
        self._columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        self._batch_size = int(options.get("batch_size", _DEFAULT_BATCH_SIZE))
        self._starting = options.get("starting", "earliest").lower()
        if self._starting not in ("earliest", "latest"):
            raise ValueError(
                f"arrow_parquet: starting={self._starting!r} "
                "(must be 'earliest' or 'latest')"
            )
        self._target_schema = _arrow_schema(self._spec, self._columns)

    def _manifest(self) -> dict:
        import pyarrow.fs as pafs

        fs, root = self._spec.resolve()
        manifest = f"{root.rstrip('/')}/{MANIFEST_NAME}"
        if fs.get_file_info(manifest).type != pafs.FileType.File:
            raise FileNotFoundError(
                f"arrow_parquet stream: no {MANIFEST_NAME} at "
                f"{self._spec.path} — this source tails "
                "manifest-committed stores (module docstring)"
            )
        with fs.open_input_stream(manifest) as stream:
            doc = json.loads(stream.read().decode("utf-8"))
        if "seq" not in doc or "part_seqs" not in doc:
            raise ValueError(
                f"arrow_parquet stream: manifest at {self._spec.path} "
                "predates the seq protocol — rewrite it with one append"
            )
        return doc

    def initialOffset(self) -> dict:
        doc = self._manifest()
        if self._starting == "latest":
            return {"seq": doc["seq"]}
        return {"seq": doc["base_seq"] - 1}

    def latestOffset(self) -> dict:
        return {"seq": self._manifest()["seq"]}

    def partitions(self, start: dict, end: dict):
        doc = self._manifest()
        if start["seq"] < doc["base_seq"] - 1:
            raise UpstreamOverwrittenError(
                f"stream offset {start['seq']} predates the store's "
                f"current lineage (base_seq {doc['base_seq']}) at "
                f"{self._spec.path} — an overwrite replaced commits "
                "this stream had not read yet"
            )
        _, root = self._spec.resolve()
        root = root.rstrip("/")
        names = sorted(
            name
            for name, seq in doc["part_seqs"].items()
            if start["seq"] < seq <= end["seq"]
        )
        if not names:
            return [_RowGroupChunk("", ())]
        return [_RowGroupChunk(f"{root}/{n}", None) for n in names]

    def read(self, partition: _RowGroupChunk):
        yield from _read_chunk(
            self._spec,
            partition,
            self._target_schema,
            [],
            self._batch_size,
        )

    def commit(self, end: dict) -> None:
        pass  # retention is the manifest's concern, not the reader's

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# writer


@dataclass
class _PartCommit(WriterCommitMessage):
    parts: tuple[str, ...]
    rows: int


class ConcurrentCommitError(RuntimeError):
    """Another writer's manifest landed over this job's commit. Object
    stores have no compare-and-swap, so two racing commits are
    last-writer-wins at the PUT; the post-write read-back detects the
    overwritten loser (the ``append_guarded`` discipline from
    ``fsutil``). The loser's parts are orphans — invisible behind the
    winner's manifest — and the job must be re-run. One writer per
    store at a time is the operating contract (the same single-writer
    assumption Delta Lake documents on S3 without an external lock)."""


class ArrowParquetWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool, schema=None) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("arrow_parquet: .save(path) is required")
        self._spec = _FsSpec.from_options(path, options)
        self._overwrite = overwrite
        self._schema = schema  # Spark StructType, for empty commits
        self._max_rows = int(
            options.get("max_rows_per_part", _DEFAULT_MAX_ROWS_PER_PART)
        )
        self._post_put_hook = None  # test seam (racing-commit window)

    def _flush(self, batches, parts, rows_out) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not batches:
            return
        table = pa.Table.from_batches(batches)
        buf = io.BytesIO()
        pq.write_table(table, buf)
        name = f"part-{uuid.uuid4().hex}.parquet"
        _put_bytes(self._spec, self._spec.child(name), buf.getvalue())
        parts.append(name)
        rows_out.append(table.num_rows)

    def write(self, iterator) -> _PartCommit:
        parts: list[str] = []
        rows_out: list[int] = []
        pending, pending_rows = [], 0
        for batch in iterator:
            offset = 0
            while offset < batch.num_rows:  # a batch may exceed the cap
                take = min(
                    batch.num_rows - offset, self._max_rows - pending_rows
                )
                pending.append(batch.slice(offset, take))
                pending_rows += take
                offset += take
                if pending_rows >= self._max_rows:
                    self._flush(pending, parts, rows_out)
                    pending, pending_rows = [], 0
        self._flush(pending, parts, rows_out)
        return _PartCommit(parts=tuple(parts), rows=sum(rows_out))

    def commit(self, messages) -> None:
        """Manifest LAST: one atomic small-object replace makes every
        part visible at once. Append mode MERGES the previous manifest
        (its parts stay listed — the new manifest is the union, and the
        swap is still one atomic replace, so readers see the old or the
        new committed set, never a mix). On overwrite, parts the new
        manifest does not list are deleted AFTER it lands — readers
        resolving through the manifest never see them, so the delete is
        GC, not the commit itself."""
        import pyarrow.fs as pafs

        fs, root = self._spec.resolve()
        root = root.rstrip("/")
        new_parts = [p for m in messages if m is not None for p in m.parts]
        rows = sum(m.rows for m in messages if m is not None)
        parts = list(new_parts)
        prev = None
        manifest_path = f"{root}/{MANIFEST_NAME}"
        if fs.get_file_info(manifest_path).type == pafs.FileType.File:
            with fs.open_input_stream(manifest_path) as stream:
                prev = json.loads(stream.read().decode("utf-8"))
        # `seq` ticks once per commit and never resets — the streaming
        # reader's offset is this one integer. `part_seqs` records the
        # commit each part arrived in (append-only under append mode),
        # and `base_seq` marks where the current lineage began: an
        # overwrite bumps it, which is how a streaming reader holding a
        # pre-overwrite offset learns its window is gone and fails
        # loudly instead of silently skipping data.
        seq = (prev["seq"] + 1) if prev and "seq" in prev else 1
        if not new_parts and (self._overwrite or prev is None) and self._schema:
            # a zero-row commit must still leave a SCANNABLE store — one
            # empty part carries the schema, so readers (and the
            # streaming tail) see an empty table, not an un-inferable
            # manifest
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema

            buf = io.BytesIO()
            pq.write_table(to_arrow_schema(self._schema).empty_table(), buf)
            name = f"part-{uuid.uuid4().hex}.parquet"
            _put_bytes(self._spec, f"{root}/{name}", buf.getvalue())
            new_parts = [name]
            parts = list(new_parts)
        if self._overwrite or prev is None:
            part_seqs = {p: seq for p in new_parts}
            base_seq = seq
        else:
            parts.extend(prev["parts"])
            rows += prev["rows"]
            part_seqs = dict(prev.get("part_seqs") or {})
            part_seqs.update({p: seq for p in new_parts})
            base_seq = prev.get("base_seq", 1)
        manifest = json.dumps(
            {
                "parts": sorted(parts),
                "rows": rows,
                "format": "parquet",
                "seq": seq,
                "base_seq": base_seq,
                "part_seqs": part_seqs,
            },
            sort_keys=True,
        ).encode("utf-8")
        _put_bytes(self._spec, f"{root}/{MANIFEST_NAME}", manifest)
        if self._post_put_hook is not None:
            self._post_put_hook()  # test seam: the racing-commit window
        # read-back guard (the append_guarded discipline): no CAS on
        # object stores, so a racing commit is last-writer-wins at the
        # PUT — the overwritten loser detects it here and raises rather
        # than reporting success for rows the manifest no longer lists
        with fs.open_input_stream(f"{root}/{MANIFEST_NAME}") as stream:
            now = json.loads(stream.read().decode("utf-8"))
        if now.get("seq") != seq or now.get("parts") != sorted(parts):
            raise ConcurrentCommitError(
                f"manifest at {self._spec.path} was replaced during "
                f"commit (wrote seq {seq}, found seq {now.get('seq')}) "
                "— another writer raced this job; its commit won and "
                "this job's parts are invisible orphans. Re-run this "
                "job; one writer per store at a time is the contract."
            )
        if self._overwrite:
            keep = set(parts) | {MANIFEST_NAME}
            infos = fs.get_file_info(
                pafs.FileSelector(root, recursive=False, allow_not_found=True)
            )
            for info in infos:
                name = info.path.rsplit("/", 1)[-1]
                if info.type == pafs.FileType.File and name not in keep:
                    fs.delete_file(info.path)

    def abort(self, messages) -> None:
        fs, _ = self._spec.resolve()
        for m in messages:
            if m is None:
                continue
            for name in m.parts:
                try:
                    fs.delete_file(self._spec.child(name))
                except OSError:
                    pass  # orphan stays; the manifest never lists it


# ---------------------------------------------------------------------------
# datasource + helpers


class ArrowParquetDataSource(DataSource):
    """``spark.read.format("arrow_parquet")`` / ``df.write.format(...)``
    — module docstring for the contracts."""

    @classmethod
    def name(cls) -> str:
        return "arrow_parquet"

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("arrow_parquet: .load(path) is required")
        cols = self.options.get("columns", "")
        columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        # prefer_timestamp_ntz matches Spark's own parquet inference:
        # a timestamp column without isAdjustedToUTC reads as
        # TimestampNTZ, exactly what spark.read.parquet would give
        return from_arrow_schema(
            _arrow_schema(_FsSpec.from_options(path, self.options), columns),
            prefer_timestamp_ntz=True,
        )

    def reader(self, schema: StructType) -> ArrowParquetReader:
        return ArrowParquetReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ArrowParquetWriter:
        return ArrowParquetWriter(self.options, overwrite, schema)

    def streamReader(self, schema: StructType) -> ArrowParquetStreamReader:
        return ArrowParquetStreamReader(schema, self.options)


def register_arrow_parquet(spark) -> None:
    """Idempotent per-session registration (re-registering the same
    name is a cheap overwrite). Also flips on the Python-source filter
    pushdown conf for sessions not built by ``session.get_spark`` —
    without it Spark refuses to plan a reader that implements
    ``pushFilters`` at all."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ArrowParquetDataSource)


def read_arrow_parquet(
    spark,
    path: str,
    columns: list[str] | None = None,
    **options: str,
):
    """Convenience reader; ``options`` pass through (endpoint_url,
    access_key, secret_key, region, max_partition_bytes, batch_size)."""
    register_arrow_parquet(spark)
    reader = spark.read.format("arrow_parquet")
    if columns:
        reader = reader.option("columns", ",".join(columns))
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load(path)
