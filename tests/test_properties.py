"""Property-based tests (hypothesis) for the exact-arithmetic kernels.

Each property batches all generated cases into ONE DataFrame so a hypothesis
example costs one Spark job, keeping the suite fast.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark import schemas
from cloudcomputing_flink_application_spark.functions.scalar import (
    avg_half_up_cents,
    mph_from_speed_mps,
)
from cloudcomputing_flink_application_spark.operators.telematics import accident_reports


def java_mph(dpos: int, dt: int) -> int:
    """Pure-Python model of VehicleTelematics.java:283 (Java int semantics).

    Operands here are positive (as in every reachable reference path), so
    Java's truncating division equals floor division.
    """
    v1 = dpos // dt
    v2 = v1 * 3600 // 1000
    return int(v2 * 0.621371)  # int() truncates toward zero, same as Java (int)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 500_000), st.integers(1, 3600)),
        min_size=1,
        max_size=50,
    )
)
def test_mph_formula_matches_java_semantics(spark, cases):
    df = spark.createDataFrame(cases, ["dpos", "dt"])
    got = df.select(
        "dpos", "dt", mph_from_speed_mps(F.col("dpos"), F.col("dt")).alias("mph")
    ).collect()
    for r in got:
        assert r.mph == java_mph(r.dpos, r.dt), (r.dpos, r.dt)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 10**5)),
        min_size=1,
        max_size=50,
    )
)
def test_avg_half_up_matches_decimal(spark, cases):
    df = spark.createDataFrame(cases, ["sum_cents", "cnt"])
    got = df.select(
        "sum_cents",
        "cnt",
        avg_half_up_cents(F.col("sum_cents"), F.col("cnt")).alias("avg"),
    ).collect()
    for r in got:
        expect = float(
            (Decimal(r.sum_cents) / Decimal(100) / Decimal(r.cnt)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        assert r.avg == expect, (r.sum_cents, r.cnt)


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 20),  # vid
        st.integers(1, 12),  # number of consecutive stopped reports
        min_size=1,
        max_size=8,
    )
)
def test_accidents_n_minus_3_rule(spark, stopped):
    # a car stopped for N consecutive reports yields max(0, N-3) rows
    rows = []
    for vid, n in stopped.items():
        for i in range(n):
            rows.append((i * 30, vid, 0, 0, 1, 0, 10, 5000 + vid))
    df = spark.createDataFrame(rows, schema=schemas.CAR_REPORTS)
    out = accident_reports(df).groupBy("vid").count().collect()
    got = {r.vid: r["count"] for r in out}
    for vid, n in stopped.items():
        assert got.get(vid, 0) == max(0, n - 3), (vid, n)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 400_000)),  # (user, ts offset s)
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_sessionize_matches_python_model(spark, events):
    # property: per-user session count == python model with the same gap rule
    from datetime import datetime, timedelta

    from cloudcomputing_flink_application_spark.operators.timeseries import (
        SESSION_GAP_MIN,
        sessionize,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=off), uid, "click", 1.0, None)
        for i, (uid, off) in enumerate(sorted(events, key=lambda e: (e[0], e[1])))
    ]
    import os
    import tempfile

    import pandas as pd

    # sessionize reads events parquet via read_events (nanos normalization),
    # so materialize the generated rows the same way the driver data is laid out
    d = tempfile.mkdtemp()
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    out = sessionize(spark, d)
    got = {(r.user_id, r.session_seq): r.n_events for r in out.collect()}

    # python model
    gap = SESSION_GAP_MIN * 60
    model: dict[tuple[int, int], int] = {}
    by_user: dict[int, list[int]] = {}
    for uid, off in sorted(events, key=lambda e: (e[0], e[1])):
        by_user.setdefault(uid, []).append(off)
    for uid, offs in by_user.items():
        seq, prev = 0, None
        for off in offs:
            if prev is not None and off - prev > gap:
                seq += 1
            model[(uid, seq)] = model.get((uid, seq), 0) + 1
            prev = off
    assert got == model


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=4, max_size=20)  # text-pool indexes
)
def test_purge_invariants_random_corpora(spark, picks):
    # minhash_purge_dedup invariants under random duplicate structure:
    # (1) identical texts always share a cluster (identical band keys);
    # (2) every cluster's keeper is its minimum doc_id;
    # (3) the purged corpus conserves the input exactly (sizes sum to the
    #     corpus, chars_saved sums to the chars of non-keepers).
    from cloudcomputing_flink_application_spark.operators.dedup import (
        minhash_cc_dedup,
        minhash_purge_dedup,
    )

    pool = [
        "alpha beta gamma delta epsilon",
        "zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi",
        "rho sigma tau upsilon phi chi",
        "psi omega alef bet gimel dalet",
        "he vav zayin het tet yod",
    ]
    docs = [(i, pool[p], "en", "s0", len(pool[p])) for i, p in enumerate(picks)]
    df = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    clusters = {r.doc_id: r.cluster_id for r in minhash_cc_dedup(df).collect()}
    purged = minhash_purge_dedup(df).collect()

    by_text: dict[str, set[int]] = {}
    for i, p in enumerate(picks):
        by_text.setdefault(pool[p], set()).add(i)
    for ids in by_text.values():  # (1)
        assert len({clusters[i] for i in ids}) == 1, (ids, clusters)
    members: dict[int, set[int]] = {}
    for d, c in clusters.items():
        members.setdefault(c, set()).add(d)
    for c, ms in members.items():  # (2)
        assert c == min(ms), (c, ms)
    chars = {d[0]: d[4] for d in docs}
    assert sum(r.n_members for r in purged) == len(docs)  # (3)
    assert {r.doc_id for r in purged} == set(members)
    assert sum(r.chars_saved for r in purged) == sum(
        chars[d] for d, c in clusters.items() if d != c
    )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # corpora of short docs over a 3-token alphabet: dense dups
        st.lists(st.integers(0, 2), min_size=0, max_size=10),
        min_size=1,
        max_size=12,
    )
)
def test_span_family_matches_python_model(spark, corpora):
    # dup_span_stats / scrub_dup_spans vs a brute-force Python model: the
    # model explodes every duplicated window into its covered positions
    # (the simple road); the operators use the ordered coverage-union and
    # gaps-and-islands forms — the answers must be identical under any
    # duplicate structure, self-repetition and overlaps included.
    from collections import Counter

    from cloudcomputing_flink_application_spark.operators.pipeline import (
        dup_span_stats,
        scrub_dup_spans,
    )

    w = 2
    alphabet = ["aa", "bb", "cc"]
    docs = [
        (i, " ".join(alphabet[t] for t in toks)) for i, toks in enumerate(corpora)
    ]
    toks = {d: [t for t in txt.split() if t] for d, txt in docs}
    wins: Counter = Counter()
    starts = {}
    for d, tk in toks.items():
        ws = [" ".join(tk[i : i + w]) for i in range(len(tk) - w + 1)]
        starts[d] = ws
        wins.update(ws)
    stats_model, scrub_model = {}, {}
    for d, tk in toks.items():
        dup_ps = [i + 1 for i, s in enumerate(starts[d]) if wins[s] >= 2]
        cov: set = set()
        for p in dup_ps:
            cov.update(range(p, p + w))
        kept = [t for i, t in enumerate(tk) if (i + 1) not in cov]
        stats_model[d] = (len(tk), max(0, len(tk) - w + 1), len(dup_ps), len(cov))
        scrub_model[d] = (" ".join(kept), len(kept), len(tk) - len(kept))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got_stats = {
        r.doc_id: (r.n_tokens, r.n_windows, r.dup_windows, r.dup_tokens)
        for r in dup_span_stats(df, w=w).collect()
    }
    got_scrub = {
        r.doc_id: (r.clean_text, r.kept_tokens, r.removed_tokens)
        for r in scrub_dup_spans(df, w=w).collect()
    }
    assert got_stats == stats_model
    assert got_scrub == scrub_model


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=10),  # doc lengths
    st.integers(2, 6),   # n
    st.integers(0, 3),   # overlap (clamped below n)
)
def test_chunk_docs_coverage_and_bounds(spark, lengths, n, overlap):
    # Chunking invariants under random doc lengths and (n, overlap):
    # every token of every doc is covered by >= 1 chunk, every chunk is
    # within the n-token bound, chunk ids are contiguous from 0, and
    # rejoining chunk tokens at stride offsets reconstructs the doc.
    from cloudcomputing_flink_application_spark.operators.pipeline import (
        chunk_docs,
    )

    overlap = min(overlap, n - 1)
    stride = n - overlap
    docs = [
        (i, " ".join(f"t{i}x{j}" for j in range(ln)))
        for i, ln in enumerate(lengths)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = chunk_docs(df, n=n, overlap=overlap).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert 1 <= r.n_chunk_tokens <= n
        assert len(r.chunk_text.split()) == r.n_chunk_tokens
    for doc_id, ln in enumerate(lengths):
        rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if ln == 0:
            assert not rows
            continue
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        covered: set = set()
        recon: dict = {}
        for r in rows:
            start = r.chunk_id * stride + 1
            toks = r.chunk_text.split()
            for off, t in enumerate(toks):
                pos = start + off
                covered.add(pos)
                assert recon.get(pos, t) == t  # overlaps agree
                recon[pos] = t
        assert covered == set(range(1, ln + 1))
        assert [recon[p] for p in range(1, ln + 1)] == [
            f"t{doc_id}x{j}" for j in range(ln)
        ]


@given(
    dims=st.lists(
        st.tuples(st.integers(1, 8192), st.integers(1, 8192)),
        min_size=1, max_size=64,
    ),
    max_side=st.integers(1, 4096),
)
@settings(max_examples=60, deadline=None)
def test_fit_dims_invariants(dims, max_side):
    # The aspect-fit arithmetic behind image_resize / mm_media_probe:
    # (1) never upscales; (2) the longest side lands exactly at max_side
    # whenever scaling happened; (3) both dims stay >= 1; (4) aspect ratio
    # is preserved to integer-floor precision.  Pure pandas — no Spark.
    import pandas as pd

    from cloudcomputing_flink_application_spark.operators.multimodal import _fit_dims

    w = pd.Series([d[0] for d in dims], dtype="int64")
    h = pd.Series([d[1] for d in dims], dtype="int64")
    nw, nh = _fit_dims(w, h, max_side)
    for wi, hi, nwi, nhi in zip(w, h, nw, nh):
        assert nwi >= 1 and nhi >= 1
        assert nwi <= wi and nhi <= hi           # never upscale
        if wi <= max_side and hi <= max_side:
            assert (nwi, nhi) == (wi, hi)        # already fits: untouched
        else:
            ls = max(wi, hi)
            # longest side scales exactly to max_side; the other is the
            # exact floor of the proportional scale, floored at 1
            assert max(nwi, nhi) == max_side
            assert nwi == max(1, wi * max_side // ls)
            assert nhi == max(1, hi * max_side // ls)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # batch sizes: 1..4 batches of 1..6 docs
        st.integers(1, 6), min_size=1, max_size=4
    ),
    st.data(),
)
def test_delta_fold_matches_full_at_every_prefix(spark, batch_sizes, data):
    # Algebraic pin of the delta purge emitter (r8) beyond the two
    # crafted scenarios: random ordered-arrival edge streams (each new
    # doc links to 0-2 earlier docs — exactly the stream's star-edge
    # shape), folded delta emissions vs purge_from_edges at EVERY batch
    # prefix.  Covers random merge chains, tombstone cascades, and
    # singleton re-emissions the two example tests cannot enumerate.
    from cloudcomputing_flink_application_spark.operators.dedup import (
        purge_delta_from_edges,
        purge_from_edges,
        release_cached,
    )

    docs = list(range(1, sum(batch_sizes) + 1))
    batches, i = [], 0
    for n in batch_sizes:
        batches.append(docs[i : i + n])
        i += n
    edges = []
    for b_idx, batch in enumerate(batches):
        for d in batch:
            earlier = [x for x in docs if x < d]
            if earlier:
                n_links = data.draw(
                    st.integers(0, min(2, len(earlier))), label=f"links{d}"
                )
                partners = data.draw(
                    st.permutations(earlier), label=f"partners{d}"
                )[:n_links]
                edges.extend((d, p, b_idx) for p in partners)

    def frame(rows, schema):
        return spark.createDataFrame(rows, schema)

    # The delta history as the OUTPUT DIR holds it: (batch_id, rows)
    # partitions.  fold/compact below mirror purge_table_from_deltas /
    # _compact_delta_partitions exactly (latest row per doc across
    # partitions, tombstones dropped; compaction = live rows of the
    # folded prefix as ONE partition at the prefix's max batch_id) — the
    # file-level parity of this model is pinned end-to-end in
    # tests/test_streaming.py::test_purge_delta_compaction_bounds_history.
    def fold(history):
        latest: dict[int, tuple] = {}
        for _, rows in sorted(history, key=lambda t: t[0]):
            for d, m, c in rows:
                latest[d] = (m, c)
        return {(d, m, c) for d, (m, c) in latest.items() if m > 0}

    def compact(history, below):
        pre = [(b, r) for b, r in history if b < below]
        post = [(b, r) for b, r in history if b >= below]
        if not pre:
            return history
        snap_id = max(b for b, _ in pre)
        return [(snap_id, sorted(fold(pre)))] + post

    # r9: compaction must be fold-transparent at EVERY point — draw one
    # batch index after which the history is compacted, and keep
    # asserting fold == batch operator at every later prefix too.
    compact_after = data.draw(
        st.integers(0, len(batches) - 1), label="compact_after"
    )
    history: list[tuple[int, list]] = []
    seen_docs: list[int] = []
    try:
        for b_idx, batch in enumerate(batches):
            seen_docs.extend(batch)
            stats = frame(
                [(d, d * 3 + 7) for d in seen_docs], "doc_id LONG, n_chars LONG"
            )
            e_rows = [(u, v) for (u, v, bi) in edges if bi <= b_idx]
            e = frame(e_rows or [], "u LONG, v LONG")
            new = frame([(d,) for d in batch], "doc_id LONG")
            history.append(
                (
                    b_idx,
                    [
                        (r.doc_id, r.n_members, r.chars_saved)
                        for r in purge_delta_from_edges(e, stats, new).collect()
                    ],
                )
            )
            expected = {
                (r.doc_id, r.n_members, r.chars_saved)
                for r in purge_from_edges(e, stats).collect()
            }
            assert fold(history) == expected, (b_idx, batches, e_rows)
            if b_idx == compact_after:
                history = compact(history, below=b_idx + 1)
                assert fold(history) == expected, (
                    "compaction changed the fold", b_idx, batches, e_rows,
                )
    finally:
        release_cached()


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=200), max_size=60),
    budget=st.integers(min_value=1, max_value=100),
)
def test_ffd_core_invariants(sizes, budget):
    """The pure FFD core behind pack_bins (no Spark session needed):
    capacity, conservation, placement offsets, oversize singletons, and
    the ceil(sum/budget) lower bound over regular bins."""
    from cloudcomputing_flink_application_spark.operators.pipeline import _ffd_assign

    desc = sorted(sizes, reverse=True)  # the UDF pre-sorts (n_tok DESC)
    seqs, begins, oversize = _ffd_assign(desc, budget)
    assert len(seqs) == len(begins) == len(oversize) == len(desc)
    loads: dict[int, int] = {}
    members: dict[int, int] = {}
    for nt, b, off, over in zip(desc, seqs, begins, oversize):
        assert over == (nt > budget)
        # placement offset == the bin's load at placement time
        assert off == loads.get(b, 0)
        loads[b] = loads.get(b, 0) + nt
        members[b] = members.get(b, 0) + 1
    # conservation
    assert sum(loads.values()) == sum(desc)
    # bins are numbered densely from 0
    assert sorted(loads) == list(range(len(loads)))
    for b, load in loads.items():
        has_over = any(o for s, o in zip(seqs, oversize) if s == b)
        if has_over:
            assert members[b] == 1  # oversize bins stay singletons
        else:
            assert load <= budget
    # regular-bin lower bound: can't beat ceil(regular tokens / budget)
    reg_toks = sum(nt for nt, o in zip(desc, oversize) if not o)
    reg_bins = len({s for s, o in zip(seqs, oversize) if not o})
    if reg_toks > 0:
        assert reg_bins >= -(-reg_toks // budget)
