"""Sequence-packing operator: partition-local greedy next-fit packing."""

from pyspark.sql import functions as F

from connect_server_spark.operators.packing import pack_sequences


def _greedy(rows, budget):
    """Reference greedy next-fit in id order."""
    out, pack, used, slot = {}, 0, 0, 0
    first = True
    for doc_id, n in sorted(rows):
        if first or used + n > budget:
            pack += 0 if first else 1
            used, slot, first = 0, 0, False
        out[doc_id] = (pack, slot)
        used += n
        slot += 1
    return out


def test_single_partition_matches_reference_greedy(spark):
    rows = [(i, (i * 37) % 900 + 10) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    got = {
        r.id: (r.pack_id, r.pack_slot)
        for r in pack_sequences(
            df, "doc_id", "toks", budget=2048, num_partitions=1
        ).collect()
    }
    want = _greedy(rows, 2048)
    assert got == want  # partition 0 → pack_id == local index


def test_multi_partition_invariants_and_determinism(spark):
    rows = [(i, (i * 53) % 1200 + 5) for i in range(500)]
    # one oversized doc: must sit alone in its pack
    rows.append((9999, 10_000))
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    out1 = pack_sequences(df, "doc_id", "toks", budget=4096,
                          num_partitions=7).collect()
    out2 = pack_sequences(df, "doc_id", "toks", budget=4096,
                          num_partitions=7).collect()
    # deterministic across runs
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # every doc exactly once
    assert sorted(r.id for r in out1) == sorted(i for i, _ in rows)
    by_pack = {}
    for r in out1:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pack_id, members in by_pack.items():
        total = sum(m.n_tokens for m in members)
        # budget respected unless the pack is a lone oversized doc
        assert total <= 4096 or len(members) == 1, (pack_id, total)
        # slots contiguous from 0 in id order
        members.sort(key=lambda m: m.pack_slot)
        assert [m.pack_slot for m in members] == list(range(len(members)))
        assert [m.id for m in members] == sorted(m.id for m in members)
    [oversized] = [r for r in out1 if r.id == 9999]
    assert len(by_pack[oversized.pack_id]) == 1


def test_packing_efficiency_bound(spark):
    """Greedy next-fit wastes < one doc per pack boundary: with docs
    ≤ budget/4, fill ratio must exceed 75% on every CLOSED pack."""
    rows = [(i, (i * 17) % 512 + 1) for i in range(400)]  # ≤ 512 ≤ 2048/4
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    out = pack_sequences(df, "doc_id", "toks", budget=2048,
                         num_partitions=4).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault(r.pack_id, 0)
        by_pack[r.pack_id] += r.n_tokens
    # last pack of each partition may be partial — drop the 4 smallest
    fills = sorted(by_pack.values())[4:]
    assert all(f > 2048 * 0.75 for f in fills), fills


def test_packing_null_and_negative_token_counts(spark):
    """Review pin: null/negative token counts pack as 0 (never dropped,
    never a NaN crash); a null id raises a clear contract error."""
    import pytest

    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, -5), (4, 50)],
        "doc_id long, toks long",
    )
    out = {
        r.id: (r.n_tokens, r.pack_id)
        for r in pack_sequences(
            df, "doc_id", "toks", budget=200, num_partitions=1
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}          # nothing dropped
    assert out[2][0] == 0 and out[3][0] == 0  # clamped to 0 cost
    # 100 + 0 + 0 + 50 fit one pack
    assert len({p for _, p in out.values()}) == 1

    bad = spark.createDataFrame([(None, 10)], "doc_id long, toks long")
    with pytest.raises(Exception, match="null id"):
        pack_sequences(bad, "doc_id", "toks", budget=10).collect()


def test_chunk_documents_ranges_and_compose_with_packing(spark):
    """chunk_documents emits exact ceil(n/budget) contiguous ranges; an
    empty/null doc keeps one empty chunk; composing chunk → pack makes
    EVERY pack respect the budget strictly (no oversized singletons)."""
    df = spark.createDataFrame(
        [(1, 100), (2, 1000), (3, 0), (4, None), (5, 256)],
        "doc_id long, toks long",
    )
    from connect_server_spark.operators.packing import chunk_documents

    chunks = chunk_documents(df, "doc_id", "toks", budget=256).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].chunk_tokens == 100
    got2 = sorted((r.chunk_idx, r.token_start, r.chunk_tokens)
                  for r in by_id[2])
    assert got2 == [(0, 0, 256), (1, 256, 256), (2, 512, 256), (3, 768, 232)]
    assert sum(c for _, _, c in got2) == 1000  # lossless coverage
    assert [r.chunk_tokens for r in by_id[3]] == [0]
    assert [r.chunk_tokens for r in by_id[4]] == [0]
    assert [r.chunk_tokens for r in by_id[5]] == [256]

    # compose: synthetic chunk id keeps id order, then pack strictly
    chunked = chunk_documents(df, "doc_id", "toks", budget=256)
    packable = chunked.select(
        (F.col("id") * 1024 + F.col("chunk_idx")).alias("cid"),
        "chunk_tokens",
    )
    packed = pack_sequences(
        packable, "cid", "chunk_tokens", budget=512, num_partitions=1
    ).collect()
    by_pack = {}
    for r in packed:
        by_pack.setdefault(r.pack_id, 0)
        by_pack[r.pack_id] += r.n_tokens
    assert all(total <= 512 for total in by_pack.values())  # STRICT now
    assert sum(by_pack.values()) == 100 + 1000 + 0 + 0 + 256


def test_chunk_documents_plan_is_scan_stage(spark):
    from connect_server_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, 10)], "doc_id long, toks long")
    plan = (
        chunk_documents(df, "doc_id", "toks", 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_chunk_documents_schema_and_edge_contracts(spark):
    """Review pins: CHUNK_SCHEMA matches the actual output schema; a
    null id raises; huge counts clamp (never a negative/descending
    chunk sequence)."""
    import pytest

    from connect_server_spark.operators.packing import (
        CHUNK_SCHEMA,
        _MAX_DOC_TOKENS,
        chunk_documents,
    )
    from pyspark.sql.types import StructType

    df = spark.createDataFrame([(1, 10)], "doc_id long, toks long")
    out = chunk_documents(df, "doc_id", "toks", 8)
    declared = StructType.fromDDL(CHUNK_SCHEMA)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in declared.fields
    ]

    bad = spark.createDataFrame([(None, 10)], "doc_id long, toks long")
    with pytest.raises(Exception, match="null id"):
        chunk_documents(bad, "doc_id", "toks", 8).collect()

    # a degenerate count clamps to _MAX_DOC_TOKENS and still chunks with
    # non-negative ascending indices (budget sized to keep the fan-out
    # collectable)
    huge = spark.createDataFrame(
        [(7, (1 << 60))], "doc_id long, toks long"
    )
    rows = chunk_documents(
        huge, "doc_id", "toks", budget=1 << 36
    ).collect()
    assert len(rows) == _MAX_DOC_TOKENS // (1 << 36)
    assert all(r.chunk_idx >= 0 and r.chunk_tokens > 0 for r in rows)
    assert sum(r.chunk_tokens for r in rows) == _MAX_DOC_TOKENS


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @given(
        toks=st.lists(st.integers(min_value=0, max_value=300),
                      min_size=1, max_size=60),
        budget=st.integers(min_value=1, max_value=500),
    )
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_pack_sequences_property_matches_reference(spark, toks, budget):
        """Any token distribution, any budget: single-partition packing
        equals the reference next-fit fold exactly."""
        rows = [(i, t) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, "doc_id long, toks long")
        got = {
            r.id: (r.pack_id, r.pack_slot)
            for r in pack_sequences(
                df, "doc_id", "toks", budget=budget, num_partitions=1
            ).collect()
        }
        assert got == _greedy(rows, budget), (toks, budget)


def test_chunk_and_pack_every_pack_fits_and_coverage_is_lossless(spark):
    """The composed chunk→pack pipeline (r5 verdict "missing #2"):
    (a) ZERO packs over budget — even with documents several times the
    budget (pack_sequences alone would give those a lone oversized
    pack); (b) token coverage is lossless — each document's chunk_tokens
    sum to its clamped count; (c) a document's chunks pack in order;
    (d) re-running yields the identical assignment (retry determinism)."""
    from connect_server_spark.operators.packing import chunk_and_pack

    budget = 100
    rows = [
        (1, 950),   # ~10 chunks
        (2, 100),   # exactly budget
        (3, 101),   # budget + 1 → two chunks
        (4, 0),     # empty doc → one 0-token chunk
        (5, None),  # null count → clamps to 0, still present
        (6, 37),
        (7, 250),
        (8, -5),    # negative clamps to 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = chunk_and_pack(df, "doc_id", "n", budget=budget, num_partitions=2)
    got = out.collect()

    # (a) no pack over budget
    by_pack = {}
    for r in got:
        by_pack.setdefault(r.pack_id, []).append(r)
    assert by_pack
    for pack_id, members in by_pack.items():
        assert sum(m.chunk_tokens for m in members) <= budget, pack_id
        # slots are 0..k-1 in order
        assert sorted(m.pack_slot for m in members) == list(
            range(len(members))
        )
        # token_offset = cumulative width of earlier slots (loader-ready)
        off = 0
        for m in sorted(members, key=lambda x: x.pack_slot):
            assert m.token_offset == off, (pack_id, m)
            off += m.chunk_tokens

    # (b) lossless coverage per document
    per_doc = {}
    for r in got:
        per_doc.setdefault(r.id, []).append(r)
    clamped = {i: max(n or 0, 0) for i, n in rows}
    for doc_id, chunks in per_doc.items():
        assert sum(c.chunk_tokens for c in chunks) == clamped[doc_id]
        # ranges tile the document contiguously
        idxs = sorted(c.chunk_idx for c in chunks)
        assert idxs == list(range(len(idxs)))
        for c in chunks:
            assert c.token_start == c.chunk_idx * budget
            assert 0 <= c.chunk_tokens <= budget
    assert set(per_doc) == set(clamped)  # nothing dropped

    # (c) chunk order within a document follows (pack_id, pack_slot)
    for doc_id, chunks in per_doc.items():
        by_order = sorted(chunks, key=lambda c: (c.pack_id, c.pack_slot))
        assert [c.chunk_idx for c in by_order] == sorted(
            c.chunk_idx for c in chunks
        )

    # (d) deterministic under retry
    again = chunk_and_pack(
        df, "doc_id", "n", budget=budget, num_partitions=2
    ).collect()
    key = lambda r: (r.id, r.chunk_idx)
    assert sorted(map(tuple, again), key=lambda t: t[:2]) == sorted(
        map(tuple, got), key=lambda t: t[:2]
    )


def test_pack_chunks_null_id_raises(spark):
    import pytest

    from connect_server_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(
        [(None, 0, 10)], "id long, chunk_idx long, chunk_tokens long"
    )
    with pytest.raises(Exception, match="null id"):
        pack_chunks(df, budget=100).collect()


def test_chunk_and_pack_plan_adds_no_shuffle(spark):
    """Chunking is scan-stage Catalyst and packing is one mapInPandas
    pass: without an explicit repartition the composed plan has ZERO
    Exchange nodes."""
    from connect_server_spark.operators.packing import chunk_and_pack

    df = spark.createDataFrame(
        [(i, 100 + i) for i in range(10)], "doc_id long, n long"
    )
    out = chunk_and_pack(df, "doc_id", "n", budget=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan
