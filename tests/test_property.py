"""Property-based tests (SURVEY §5.3, hypothesis): random key universes and
random commit scripts must satisfy the lake-format algebra:

- delete_view(T) == snapshot(T-1) anti-joined on snapshot(T) keys,
- snapshot(T) (+) all deletes(<=T) reconstructs every key ever live,
- incremental(T1, T2) == keys touched by commits in (T1, T2].

Each generated case scripts a fresh COW table with real commits — slow per
example, so examples are few but each exercises the full write->meta->read
pipeline end to end.
"""

import os
import shutil

import pytest

pytestmark = pytest.mark.slow  # randomized soak: explicit-run only (pytest -m slow)
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hudi_delete_view_spark.sources.cow import CowTable, RECORD_KEY_FIELD
from hudi_delete_view_spark.sources.delete_view import DeleteView

TS = ["20270101000000", "20270102000000", "20270103000000", "20270104000000"]


@st.composite
def commit_script(draw):
    """A key universe plus per-commit delete subsets."""
    n = draw(st.integers(min_value=4, max_value=40))
    keys = list(range(n))
    # two delete commits over disjoint-ish random subsets (may overlap: the
    # second delete only removes what is still live)
    d1 = draw(st.sets(st.sampled_from(keys), max_size=n))
    d2 = draw(st.sets(st.sampled_from(keys), max_size=n))
    return keys, sorted(d1), sorted(d2)


def _build(spark, base, keys, d1, d2):
    shutil.rmtree(base, ignore_errors=True)
    table = CowTable(
        spark, base, key_fields=["k"], partition_field="p", num_file_groups=2
    )
    df = spark.createDataFrame(
        [(k, f"p{k % 2}", k * 10) for k in keys], ["k", "p", "v"]
    )
    table.bulk_insert(df, TS[0])
    live = set(keys)
    if d1:
        table.delete_where(F.col("k").isin(list(d1)), TS[1])
        live -= set(d1)
    d2_live = sorted(set(d2) & live)
    if d2_live:
        table.delete_where(F.col("k").isin(d2_live), TS[2])
        live -= set(d2_live)
    return table, live, sorted(set(d1)), d2_live


@pytest.fixture(scope="module")
def prop_root(spark):
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "prop"
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    yield root
    shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(script=commit_script())
def test_delete_view_equals_set_difference(spark, prop_root, script):
    keys, d1, d2 = script
    base = os.path.join(prop_root, "t1")
    table, live, d1_eff, d2_eff = _build(spark, base, keys, set(d1), set(d2))

    def view_keys(ts):
        dv = DeleteView(spark, base, ts)
        return sorted(int(r["k"]) for r in dv.dataset().select("k").collect())

    if d1_eff:
        assert view_keys(TS[1]) == d1_eff
    if d2_eff:
        assert view_keys(TS[2]) == d2_eff

    # snapshot ⊎ deletes reconstructs the full key universe
    snap_keys = {int(r["k"]) for r in table.snapshot().select("k").collect()}
    assert snap_keys == live
    assert sorted(snap_keys | set(d1_eff) | set(d2_eff)) == sorted(keys)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(script=commit_script())
def test_incremental_and_time_travel(spark, prop_root, script):
    keys, d1, d2 = script
    base = os.path.join(prop_root, "t2")
    table, live, d1_eff, d2_eff = _build(spark, base, keys, set(d1), set(d2))

    # time travel to C1 sees the full universe
    t0 = {int(r["k"]) for r in table.snapshot(as_of=TS[0]).select("k").collect()}
    assert t0 == set(keys)
    if d1_eff:
        t1 = {int(r["k"]) for r in table.snapshot(as_of=TS[1]).select("k").collect()}
        assert t1 == set(keys) - set(d1_eff)
        # incremental (C1, C1]: the rewrite of surviving rows in deleted groups
        inc = table.incremental(TS[0], TS[1])
        inc_keys = {int(r["k"]) for r in inc.select("k").collect()}
        assert inc_keys.isdisjoint(set(d1_eff))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 1000)), min_size=1, max_size=60
    )
)
def test_upsert_latest_wins(spark, prop_root, rows):
    """Random upsert batches: the snapshot must hold exactly the last
    value written per key (row_number dedup inside the writer)."""
    base = os.path.join(prop_root, "t3")
    shutil.rmtree(base, ignore_errors=True)
    table = CowTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)
    half = max(1, len(rows) // 2)
    first, second = rows[:half], rows[half:]
    expected = {}
    df1 = spark.createDataFrame([(k, "p0", v) for k, v in first], ["k", "p", "v"])
    table.bulk_insert(df1, TS[0])
    # bulk_insert dedups keys deterministically by payload order: min v wins
    for k, v in sorted(first, key=lambda t: (t[0], t[1]), reverse=True):
        expected[k] = v
    for k, v in sorted(first):
        expected[k] = min(v2 for k2, v2 in first if k2 == k)
    if second:
        df2 = spark.createDataFrame([(k, "p0", v) for k, v in second], ["k", "p", "v"])
        table.upsert(df2, TS[1])
        for k in {k for k, _ in second}:
            expected[k] = min(v2 for k2, v2 in second if k2 == k)
    got = {int(r["k"]): int(r["v"]) for r in table.snapshot().select("k", "v").collect()}
    assert got == expected


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.sets(st.integers(0, 20), min_size=1, max_size=10),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_mor_random_delta_script(spark, prop_root, ops):
    """Random delta upsert/tombstone sequences: the merged snapshot must
    equal a driver-side replay of the same script (latest wins, tombstones
    drop), and compaction must preserve it exactly."""
    import shutil as _sh

    from hudi_delete_view_spark.sources.mor import MorTable

    base = os.path.join(prop_root, "mor")
    _sh.rmtree(base, ignore_errors=True)
    t = MorTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)
    keys = list(range(21))
    t.bulk_insert(
        spark.createDataFrame([(k, "p0", 0) for k in keys], ["k", "p", "v"]),
        "20310101000000",
    )
    model = {k: 0 for k in keys}
    for i, (op, subset) in enumerate(ops):
        ts = f"203101020000{i:02d}"
        sub = sorted(subset)
        if op == "upsert":
            t.upsert_delta(
                spark.createDataFrame([(k, "p0", i + 1) for k in sub], ["k", "p", "v"]), ts
            )
            for k in sub:
                model[k] = i + 1
        else:
            live = [k for k in sub if k in model]
            if not live:
                continue
            t.delete_delta(
                spark.createDataFrame([(k, "p0") for k in live], ["k", "p"]), ts
            )
            for k in live:
                model.pop(k)
    got = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert got == model
    # compaction must not change the merged view
    from hudi_delete_view_spark.plans.slices import resolve_slices
    from hudi_delete_view_spark.plans.timeline import TimelineError

    try:
        t.compact("20310103000000")
        got2 = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
        assert got2 == model
    except TimelineError:
        pass  # no logs to compact (all ops were no-ops)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=6, max_value=30),
    evolved=st.sets(st.integers(min_value=0, max_value=29), min_size=1, max_size=10),
    deleted=st.sets(st.integers(min_value=0, max_value=29), min_size=1, max_size=10),
)
def test_schema_evolution_then_delete_view(spark, prop_root, n, evolved, deleted):
    """Schema evolution x delete view: a commit ADDS a column, then a
    delete commit's view must reconstruct rows across the schema boundary
    (the old slice lacks the new column; unionByName(allowMissingColumns)
    must surface NULLs, not drop rows or misalign columns)."""
    evolved = sorted(k for k in evolved if k < n)
    deleted = sorted(k for k in deleted if k < n)
    if not deleted:
        return
    base = os.path.join(prop_root, "evo")
    shutil.rmtree(base, ignore_errors=True)
    t = CowTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)
    df = spark.createDataFrame([(k, f"p{k % 2}", k * 10) for k in range(n)], ["k", "p", "v"])
    t.bulk_insert(df, TS[0])
    # evolution commit: upsert a subset WITH an extra column
    if evolved:
        ups = spark.createDataFrame(
            [(k, f"p{k % 2}", k * 10 + 1, f"tag{k}") for k in evolved],
            ["k", "p", "v", "extra"],
        )
        t.upsert(ups, TS[1])
    t.delete_where(F.col("k").isin(deleted), TS[2])

    snap = t.snapshot()
    live = {k for k in range(n)} - set(deleted)
    assert {r["k"] for r in snap.select("k").collect()} == live
    if evolved:
        got = {r["k"]: r["extra"] for r in snap.select("k", "extra").collect()}
        for k in live:
            assert got[k] == (f"tag{k}" if k in evolved else None)

    dv = DeleteView(spark, base, TS[2]).dataset()
    rows = {r["k"]: r for r in dv.collect()}
    assert set(rows) == set(deleted)
    for k, r in rows.items():
        # evolved deleted rows carry their updated payload + extra column;
        # un-evolved ones carry NULL extra (if the column exists at all)
        if evolved:
            assert r["extra"] == (f"tag{k}" if k in evolved else None)
        assert r["v"] == (k * 10 + 1 if k in evolved else k * 10)


@st.composite
def cdc_script(draw):
    """Random 3-commit mutation script over a small key universe:
    (initial keys, upsert map, delete set)."""
    n = draw(st.integers(min_value=4, max_value=25))
    keys = list(range(n))
    ups = draw(
        st.dictionaries(
            st.integers(min_value=0, max_value=n + 10),  # may insert new keys
            st.integers(min_value=100, max_value=999),
            max_size=10,
        )
    )
    dels = draw(st.sets(st.integers(min_value=0, max_value=n + 10), max_size=8))
    return keys, ups, sorted(dels)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=cdc_script())
def test_cdc_matches_reference_model(spark, prop_root, script):
    """cdc(T1, T3) net effect must equal the diff of a pure-Python state
    model: inserts = appeared, updates = value changed, deletes = vanished
    (before-image), inserted-then-deleted keys absent entirely."""
    keys, ups, dels = script
    base = os.path.join(prop_root, "cdcprop")
    shutil.rmtree(base, ignore_errors=True)
    t = CowTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)

    state1 = {k: k * 10 for k in keys}
    t.bulk_insert(
        spark.createDataFrame([(k, f"p{k % 2}", v) for k, v in state1.items()], ["k", "p", "v"]),
        TS[0],
    )
    state2 = dict(state1)
    if ups:
        t.upsert(
            spark.createDataFrame([(k, f"p{k % 2}", v) for k, v in ups.items()], ["k", "p", "v"]),
            TS[1],
        )
        state2.update(ups)
    state3 = dict(state2)
    dels_live = sorted(set(dels) & set(state2))
    if dels_live:
        t.delete(
            spark.createDataFrame([(k, f"p{k % 2}") for k in dels_live], ["k", "p"]),
            TS[2],
        )
        for k in dels_live:
            state3.pop(k)

    got = {r["k"]: (r["op"], r["v"]) for r in t.cdc(TS[0]).collect()}
    want = {}
    for k in set(state1) | set(state3):
        if k not in state1 and k in state3:
            want[k] = ("insert", state3[k])
        elif k in state1 and k not in state3:
            want[k] = ("delete", state1[k])  # before-image at range start
        elif k in ups:
            # CDC update = the record was REWRITTEN in range (Delta CDF
            # semantics) — a same-value upsert is still an update
            want[k] = ("update", state3[k])
    assert got == want


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=cdc_script())
def test_ivm_equals_recompute(spark, prop_root, script):
    """Base aggregate at T1 plus the CDC retraction delta must equal the
    aggregate recomputed from the final snapshot — the IVM invariant, per
    partition, for count and sum."""
    keys, ups, dels = script
    base = os.path.join(prop_root, "ivmprop")
    shutil.rmtree(base, ignore_errors=True)
    t = CowTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)
    t.bulk_insert(
        spark.createDataFrame([(k, f"p{k % 2}", k * 10) for k in keys], ["k", "p", "v"]),
        TS[0],
    )
    if ups:
        t.upsert(
            spark.createDataFrame([(k, f"p{k % 2}", v) for k, v in ups.items()], ["k", "p", "v"]),
            TS[1],
        )
    live = set(keys) | set(ups)
    dels_live = sorted(set(dels) & live)
    if dels_live:
        t.delete(
            spark.createDataFrame([(k, f"p{k % 2}") for k in dels_live], ["k", "p"]),
            TS[2],
        )

    base_agg = t.snapshot(TS[0]).groupBy("p").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    feed = t.cdc(TS[0], include_update_preimages=True)
    sign = F.when(F.col("op").isin("insert", "update"), F.lit(1)).otherwise(F.lit(-1))
    delta = feed.select("p", sign.alias("w"), "v").groupBy("p").agg(
        F.sum("w").alias("n"), F.sum(F.col("w") * F.col("v")).alias("s")
    )
    maintained = {
        r["p"]: (r["n"], r["s"])
        for r in base_agg.unionByName(delta).groupBy("p")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .filter(F.col("n") > 0)
        .collect()
    }
    recomputed = {
        r["p"]: (r["n"], r["s"])
        for r in t.snapshot().groupBy("p")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert maintained == recomputed


@st.composite
def mor_script(draw):
    """Random MOR delta history: initial keys, a sequence of delta ops
    (upsert map / delete set), and whether a compaction lands mid-way."""
    n = draw(st.integers(min_value=4, max_value=20))
    ops = draw(
        st.lists(
            st.one_of(
                st.dictionaries(
                    st.integers(min_value=0, max_value=n + 5),
                    st.integers(min_value=100, max_value=999),
                    min_size=1, max_size=6,
                ),
                st.sets(st.integers(min_value=0, max_value=n + 5), min_size=1, max_size=5),
            ),
            min_size=1, max_size=3,
        )
    )
    compact_after = draw(st.integers(min_value=0, max_value=len(ops)))
    return n, ops, compact_after


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=mor_script())
def test_mor_history_matches_reference_model(spark, prop_root, script):
    """Random delta-commit histories (upserts insert or overwrite, deletes
    drop live keys, optional mid-history compaction): the merged snapshot
    must equal a dict-model replay at every step's end, and compaction
    must be invisible to the final state."""
    from hudi_delete_view_spark.plans.slices import resolve_slices
    from hudi_delete_view_spark.sources.mor import MorTable

    n, ops, compact_after = script
    base = os.path.join(prop_root, "morprop")
    shutil.rmtree(base, ignore_errors=True)
    t = MorTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)

    state = {k: k * 10 for k in range(n)}
    t.bulk_insert(
        spark.createDataFrame(
            [(k, f"p{k % 2}", v) for k, v in state.items()], ["k", "p", "v"]
        ),
        "20280101000000",
    )
    ts = 20280101000000
    done = 0
    for op in ops:
        if done == compact_after and any(
            s.log_paths for s in resolve_slices(t.timeline).values()
        ):
            ts += 1
            t.compact(str(ts))
        done += 1
        ts += 1
        if isinstance(op, dict):
            t.upsert_delta(
                spark.createDataFrame(
                    [(k, f"p{k % 2}", v) for k, v in op.items()], ["k", "p", "v"]
                ),
                str(ts),
            )
            state.update(op)
        else:
            live = sorted(set(op) & set(state))
            if not live:
                continue
            t.delete_delta(
                spark.createDataFrame([(k, f"p{k % 2}") for k in live], ["k", "p"]),
                str(ts),
            )
            for k in live:
                state.pop(k)

    got = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert got == state


@st.composite
def merge_script(draw):
    """A key universe plus two MERGE batches: per batch, random disjoint
    update/delete/insert key sets (inserts from a disjoint id range)."""
    n = draw(st.integers(min_value=4, max_value=30))
    keys = list(range(n))
    batches = []
    next_insert = 1000
    for _ in range(2):
        upd = draw(st.sets(st.sampled_from(keys), max_size=n))
        dele = draw(st.sets(st.sampled_from(keys), max_size=n)) - upd
        n_ins = draw(st.integers(min_value=0, max_value=5))
        ins = list(range(next_insert, next_insert + n_ins))
        next_insert += 10
        batches.append((sorted(upd), sorted(dele), ins))
    return keys, batches


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(script=merge_script())
def test_merge_into_matches_reference_model(spark, prop_root, script):
    """Random MERGE sequences vs a Python dict reference: the snapshot
    equals the model after every commit; each merge's delete view equals
    the keys the model actually removed (matched deletes only)."""
    keys, batches = script
    base = os.path.join(prop_root, "merge_prop")
    shutil.rmtree(base, ignore_errors=True)
    t = CowTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2,
                 index_columns=["v"])
    model = {k: k * 10 for k in keys}
    t.bulk_insert(
        spark.createDataFrame([(k, f"p{k % 2}", v) for k, v in model.items()],
                              ["k", "p", "v"]),
        TS[0],
    )
    for i, (upd, dele, ins) in enumerate(batches):
        rows = (
            [(k, f"p{k % 2}", 7000 + k, False) for k in upd]
            + [(k, f"p{k % 2}", 0, True) for k in dele]
            + [(k, f"p{k % 2}", 9000 + k, False) for k in ins]
        )
        if not rows:
            continue
        src = spark.createDataFrame(rows, "k int, p string, v int, is_del boolean")
        t.merge_into(src, TS[i + 1], delete_condition="is_del")
        removed = {k for k in dele if k in model}
        for k in removed:
            del model[k]
        for k in upd:
            if k in model:
                model[k] = 7000 + k
            else:
                model[k] = 7000 + k  # unmatched update = insert (MERGE not-matched)
        for k in ins:
            model[k] = 9000 + k
        got = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
        assert got == model, f"snapshot diverged at batch {i}"
        dv = {r["k"] for r in DeleteView(spark, base, TS[i + 1]).dataset().collect()} if removed else set()
        assert dv == removed, f"delete view diverged at batch {i}"
    # value-index sweep: EVERY live value must survive equality pruning
    # (no false negatives through any sequence of mixed-action rewrites)
    from collections import Counter
    live_vals = Counter(model.values())
    for v, cnt in live_vals.items():
        got_n = t.scan({"v": (v, v)}).count()
        assert got_n == cnt, f"index false negative for v={v}: {got_n} != {cnt}"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(script=merge_script())
def test_mor_merge_delta_matches_reference_model(spark, prop_root, script):
    """Random MOR MERGE sequences (mixed-action delta commits) vs the
    same dict reference: merged snapshot equals the model after every
    delta; compaction at the end converges to the same state."""
    from hudi_delete_view_spark.sources.mor import MorTable

    keys, batches = script
    base = os.path.join(prop_root, "mor_merge_prop")
    shutil.rmtree(base, ignore_errors=True)
    t = MorTable(spark, base, key_fields=["k"], partition_field="p", num_file_groups=2)
    model = {k: k * 10 for k in keys}
    t.bulk_insert(
        spark.createDataFrame([(k, f"p{k % 2}", v) for k, v in model.items()],
                              ["k", "p", "v"]),
        TS[0],
    )
    for i, (upd, dele, ins) in enumerate(batches):
        rows = (
            [(k, f"p{k % 2}", 7000 + k, False) for k in upd]
            + [(k, f"p{k % 2}", 0, True) for k in dele]
            + [(k, f"p{k % 2}", 9000 + k, False) for k in ins]
        )
        if not rows:
            continue
        src = spark.createDataFrame(rows, "k int, p string, v int, is_del boolean")
        t.merge_delta(src, TS[i + 1], delete_condition="is_del")
        for k in dele:
            model.pop(k, None)
        for k in upd:
            model[k] = 7000 + k
        for k in ins:
            model[k] = 9000 + k
        got = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
        assert got == model, f"merged snapshot diverged at delta {i}"
    if len(t.timeline.timestamps()) > 1:  # at least one delta landed
        t.compact("20270109000000")
        got = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
        assert got == model


@st.composite
def archive_script(draw):
    """Random upsert/delete sequence plus a random archive point."""
    n = draw(st.integers(min_value=5, max_value=30))
    ops = []
    for _ in range(draw(st.integers(min_value=2, max_value=4))):
        kind = draw(st.sampled_from(["upsert", "delete"]))
        keys = sorted(draw(st.sets(st.sampled_from(range(n)), min_size=1, max_size=n)))
        ops.append((kind, keys))
    keep = draw(st.integers(min_value=1, max_value=len(ops)))
    return n, ops, keep


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(script=archive_script())
def test_archive_invariant_random_scripts(spark, prop_root, script):
    """For ANY commit sequence and ANY archive point, archival never
    changes the snapshot, the full history, or post-boundary incremental
    reads — checked against a dict reference model."""
    n, ops, keep = script
    base = os.path.join(prop_root, "arch_prop")
    shutil.rmtree(base, ignore_errors=True)
    table = CowTable(spark, base, key_fields=["k"], partition_field=None,
                     num_file_groups=2)
    model: dict[int, int] = {k: k * 10 for k in range(n)}
    table.bulk_insert(
        spark.createDataFrame([(k, k * 10) for k in range(n)], ["k", "v"]),
        "20270101000000",
    )
    ts_list = ["20270101000000"]
    for i, (kind, keys) in enumerate(ops):
        ts = f"{20270101000000 + (i + 1):014d}"
        ts_list.append(ts)
        if kind == "upsert":
            table.upsert(
                spark.createDataFrame([(k, k * 10 + i + 1) for k in keys], ["k", "v"]),
                ts,
            )
            for k in keys:
                model[k] = k * 10 + i + 1
        else:
            live = sorted(set(keys) & set(model))
            if not live:
                table.upsert(
                    spark.createDataFrame([(n + i, 0)], ["k", "v"]), ts)
                model[n + i] = 0
                continue
            table.delete_where(F.col("k").isin(live), ts)
            for k in live:
                del model[k]

    hist_before = table.commit_history().collect()
    boundary_idx = len(ts_list) - keep - 1
    table.archive_timeline(keep_last_n=keep)

    got = {r["k"]: r["v"] for r in table.snapshot().select("k", "v").collect()}
    assert got == model
    assert table.commit_history().collect() == hist_before
    assert len(table.timeline.timestamps()) == keep
    # post-boundary incremental still serves; pre-boundary anchors raise
    if boundary_idx >= 0:
        anchor = ts_list[boundary_idx]
        table.incremental(anchor).count()  # boundary anchor itself is legal
        if boundary_idx > 0:
            from hudi_delete_view_spark.plans.timeline import TimelineError

            with pytest.raises(TimelineError):
                table.incremental(ts_list[0]).count()


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(script=commit_script())
def test_pyds_connector_equals_native_random(spark, prop_root, script):
    """For any commit script, the Python DataSource read equals the
    native snapshot — rows, values, and as-of time travel."""
    from hudi_delete_view_spark.sources import pyds

    keys, d1, d2 = script
    base = os.path.join(prop_root, "pyds_prop")
    table, live, d1, d2 = _build(spark, base, keys, d1, d2)
    pyds.register(spark)
    df = (spark.read.format("lakeview").option("path", base).load()
          .select("k", "p", "v").orderBy("k"))
    native = table.snapshot().select("k", "p", "v").orderBy("k")
    assert df.collect() == native.collect()
    old = (spark.read.format("lakeview").option("path", base)
           .option("as_of", TS[0]).load())
    assert old.count() == len(keys)
